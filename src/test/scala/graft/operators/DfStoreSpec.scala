package graft.operators

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Persisted document-frequency (IDF) store (round 14): `CALL
  * update_doc_freqs` counts per-term df over ONLY the documents absent
  * from the store and appends the partials as epoch-named cells;
  * serving sums the partials. The decisive properties pinned here:
  * incremental == full recompute (exact integer parity), idempotent
  * re-runs, COMPACTION SAFETY (the epoch-in-the-cell-NAME design is
  * what makes LWW folds lossless — a same-named counter cell would be
  * silently reduced to one epoch's count), and loud refusals. */
class DfStoreSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val warehouse: String =
    Files.createTempDirectory("graft-dfstore").toString

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s.conf.set("spark.sql.catalog.graft_dfs",
      classOf[graft.sources.sstable.spark.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_dfs.warehouse", warehouse)
    s.sql("CREATE NAMESPACE graft_dfs.ts")
    s
  }

  /** Exact full-recompute df over a corpus slice — the oracle for the
    * store's summed partials. */
  private def directDf(where: String): Map[String, Long] =
    graft.Tables.documents(spark, sfDir).filter(expr(where))
      .select(col("doc_id"), explode(array_distinct(Params.toks(col("text")))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private def call(table: String, where: String) = spark.sql(
    s"CALL graft_dfs.system.update_doc_freqs(table => '$table', " +
      s"source_dir => '$sfDir', where => '$where', autocompact => 3)").head()

  private def storedDf(table: String): Map[String, Long] =
    DfStore.docFreqs(spark, s"graft_dfs.$table")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("three disjoint epochs sum to the exact full-recompute df; " +
    "re-run is a no-op; n_docs adds up") {
    val r1 = call("ts.df", "doc_id % 3 = 0")
    assert(r1.getAs[Long]("alreadyStored") == 0L, r1)
    assert(r1.getAs[Int]("epoch") == 1)
    val r2 = call("ts.df", "doc_id % 3 <= 1")
    assert(r2.getAs[Long]("alreadyStored") == r1.getAs[Long]("novel"),
      s"epoch 2 must skip exactly epoch 1's docs: $r1 / $r2")
    assert(r2.getAs[Int]("epoch") == 2)
    val r3 = call("ts.df", "true")
    assert(r3.getAs[Long]("novel") > 0)
    val r4 = call("ts.df", "true")
    assert(r4.getAs[Long]("novel") == 0L, s"idempotent re-run: $r4")

    val want = directDf("true")
    val got = storedDf("ts.df")
    assert(got == want,
      s"summed epoch partials diverge from full recompute: " +
        s"${(got.toSet -- want.toSet).take(3)} vs ${(want.toSet -- got.toSet).take(3)}")
    val nCorpus = graft.Tables.documents(spark, sfDir).count()
    assert(DfStore.nDocs(spark, "graft_dfs.ts.df") == nCorpus)
    // the cf (collection frequency) partials sum to total occurrences
    val wantCf = graft.Tables.documents(spark, sfDir)
      .select(explode(Params.toks(col("text"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cf"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val gotCf = DfStore.collFreqs(spark, "graft_dfs.ts.df")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gotCf == wantCf, "summed cf partials diverge from full recompute")
  }

  test("COMPACTION is lossless: folding the epochs' generations must " +
    "not lose a partial (epoch-named cells union under LWW merge — " +
    "the design reason the epoch lives in the cell NAME)") {
    val before = storedDf("ts.df")
    val gens0 = graft.sources.sstable.LocalStorage
      .listDataFiles(s"$warehouse/ts/df").length
    spark.sql("CALL graft_dfs.system.compact(table => 'ts.df', " +
      "min_threshold => 2, min_size => 1)")
    val gens1 = graft.sources.sstable.LocalStorage
      .listDataFiles(s"$warehouse/ts/df").length
    assert(gens1 < gens0 || gens0 == 1,
      s"compact must fold the epoch generations ($gens0 -> $gens1)")
    assert(storedDf("ts.df") == before,
      "df totals changed across compaction — a partial was lost")
    assert(DfStore.nDocs(spark, "graft_dfs.ts.df") ==
      graft.Tables.documents(spark, sfDir).count())
  }

  test("a retargeted store refuses loudly (df from corpus A is a " +
    "silently-wrong statistic for corpus B)") {
    val e = intercept[Exception](spark.sql(
      "CALL graft_dfs.system.update_doc_freqs(table => 'ts.df', " +
        "source_dir => '/root/testdata/sf0.01')"))
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(e).exists(_.contains("ONE corpus")), chain(e))
  }

  test("unit => 'para': the paragraph-frequency store sums to the exact " +
    "boilerplate statistic, and a store refuses a mismatched unit " +
    "(term df read as paragraph df would silently misclassify)") {
    val r1 = spark.sql(
      s"CALL graft_dfs.system.update_doc_freqs(table => 'ts.pf', " +
        s"source_dir => '$sfDir', where => 'doc_id % 2 = 0', " +
        "autocompact => 3, unit => 'para')").head()
    assert(r1.getAs[Long]("novel") > 0)
    val r2 = spark.sql(
      s"CALL graft_dfs.system.update_doc_freqs(table => 'ts.pf', " +
        s"source_dir => '$sfDir', autocompact => 3, unit => 'para')").head()
    assert(r2.getAs[Long]("alreadyStored") == r1.getAs[Long]("novel"), r2)
    // exact parity vs a direct paragraph-frequency recompute
    val direct = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
      .groupBy(col("doc_id"), floor(col("pos") / Params.ParaWords).as("chunk"))
      .agg(array_join(transform(array_sort(collect_list(struct(col("pos"), col("word")))),
        x => x.getField("word")), " ").as("para"))
      .select(col("doc_id"), md5(col("para")).as("h")).distinct()
      .groupBy("h").agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(storedDf("ts.pf") == direct,
      "paragraph epoch partials diverge from the full recompute")
    // a 'term' probe against the 'para' store refuses loudly
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    val e = intercept[Exception](spark.sql(
      s"CALL graft_dfs.system.update_doc_freqs(table => 'ts.pf', " +
        s"source_dir => '$sfDir')"))
    assert(chain(e).exists(_.contains("one unit")), chain(e))
  }

  test("q_para_dedup_served is BIT-IDENTICAL to its full-recompute twin") {
    val twin = graft.SparkEntry.queries("q_para_dedup")(spark, sfDir).collect().toSeq
    val served = graft.SparkEntry.queries("q_para_dedup_served")(spark, sfDir).collect().toSeq
    assert(twin.nonEmpty && twin == served,
      "q_para_dedup_served diverged from q_para_dedup")
  }

  test("q_tfidf_served is BIT-IDENTICAL to its full-recompute twin " +
    "(the hash-gate parity, pinned locally)") {
    val twin = graft.SparkEntry.queries("q_tfidf_topk")(spark, sfDir).collect().toSeq
    val served = graft.SparkEntry.queries("q_tfidf_served")(spark, sfDir).collect().toSeq
    assert(twin.nonEmpty && twin == served,
      "q_tfidf_served diverged from q_tfidf_topk")
  }

  test("q_text_stats_served is BIT-IDENTICAL to its full-recompute twin " +
    "— answered from the store alone, zero corpus IO") {
    val twin = graft.SparkEntry.queries("q_text_stats")(spark, sfDir).collect().toSeq
    val served = graft.SparkEntry.queries("q_text_stats_served")(spark, sfDir).collect().toSeq
    assert(twin.nonEmpty && twin == served,
      "q_text_stats_served diverged from q_text_stats")
  }

  test("the additivity sentinel: a duplicating interleave (concurrent " +
    "updates / update racing DROP+undrop) refuses LOUDLY on the epoch " +
    "that caused it — additive partials corrupt silently where the " +
    "LWW-keyed stores collapse double-writes harmlessly") {
    call("ts.audit", "doc_id % 5 = 0")
    // forge the race's outcome through the SQL surface: one marker row
    // duplicating an already-counted doc plus its stray n-partial
    val dupId = DfStore.storedDocIds(spark, s"$warehouse/ts/audit")
      .orderBy("doc_id").head().getLong(0)
    val dupKey = f"d:$dupId%012d"
    def cellSql(name: String, v: String) =
      s"named_struct('name', CAST('$name' AS BINARY), 'state', 'NORMAL', " +
        s"'value', CAST('$v' AS BINARY), 'timestamp', CAST(1 AS BIGINT), " +
        "'ttlSecs', CAST(0 AS BIGINT), 'expiresMillis', CAST(0 AS BIGINT))"
    val noTomb = "CAST(NULL AS STRUCT<localDeletionTime: INT, markedForDeleteAt: BIGINT>)"
    spark.sql(s"INSERT INTO graft_dfs.ts.audit VALUES " +
      s"(CAST('$dupKey' AS BINARY), array(${cellSql("e", "99")}), $noTomb), " +
      s"(CAST('_n' AS BINARY), array(${cellSql("n:000099", "1")}), $noTomb)")
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    val e = intercept[Exception](call("ts.audit", "true"))
    assert(chain(e).exists(_.contains("counted twice")), chain(e))
  }

  test("storm: update_doc_freqs racing DROP+undrop never corrupts " +
    "SILENTLY — every observed outcome is a success, a loud refusal " +
    "class, or the additivity sentinel naming the corruption it just " +
    "created (the contract: loud beats silent, even under operator " +
    "error the single-maintainer contract excludes)") {
    spark.sql("CREATE NAMESPACE graft_dfs.storm")
    spark.sql("CALL graft_dfs.system.update_doc_freqs(table => " +
      s"'storm.df', source_dir => '$sfDir', where => 'doc_id % 7 = 0', " +
      "autocompact => 3)")
    val sentinelSeen = new java.util.concurrent.atomic.AtomicBoolean(false)
    val anomalies = new java.util.concurrent.ConcurrentLinkedQueue[String]
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    def legal(msgs: String): Boolean =
      msgs.contains("rerun") || msgs.contains("mid-lifecycle") ||
        msgs.contains("vanished") || msgs.contains("FileNotFound") ||
        msgs.contains("does not exist") || msgs.contains("No such file") ||
        msgs.contains("TABLE_OR_VIEW_NOT_FOUND") || msgs.contains("not found") ||
        msgs.contains("lease") || msgs.contains("exists") ||
        msgs.contains("no data and no _table pointer") ||
        msgs.contains("ONE corpus") || msgs.contains("one unit") ||
        msgs.contains("residue") || msgs.contains("dropped") ||
        msgs.contains("restoring")
    val updater = new Thread(() => {
      var slice = 0
      while (!stop.get()) {
        slice = (slice % 6) + 1
        try spark.sql("CALL graft_dfs.system.update_doc_freqs(table => " +
          s"'storm.df', source_dir => '$sfDir', " +
          s"where => 'doc_id % 7 <= $slice', autocompact => 3)")
        catch {
          case e: Throwable =>
            val msgs = Iterator.iterate[Throwable](e)(_.getCause)
              .takeWhile(_ != null)
              .flatMap(t => Seq(t.getClass.getSimpleName) ++ Option(t.getMessage))
              .mkString(" | ")
            if (msgs.contains("counted twice")) sentinelSeen.set(true)
            else if (!legal(msgs))
              anomalies.add(s"updater unexpected ${e.getClass.getSimpleName}: $msgs")
        }
      }
    }, "df-storm-updater")
    updater.start()
    try {
      for (_ <- 1 to 6) {
        try {
          spark.sql("DROP TABLE graft_dfs.storm.df")
          spark.sql("CALL graft_dfs.system.undrop_table(table => 'storm.df')")
        } catch {
          case e: Throwable =>
            val msgs = Iterator.iterate[Throwable](e)(_.getCause)
              .takeWhile(_ != null)
              .flatMap(t => Seq(t.getClass.getSimpleName) ++ Option(t.getMessage))
              .mkString(" | ")
            if (!legal(msgs))
              anomalies.add(s"ddl unexpected ${e.getClass.getSimpleName}: $msgs")
        }
        Thread.sleep(50)
      }
    } finally {
      stop.set(true)
      updater.join(60000)
    }
    assert(anomalies.isEmpty, anomalies.toArray.mkString("\n"))
    // the decisive check: if the store ended up corrupt, some call MUST
    // have said so loudly — silent corruption is the only illegal end
    val table = spark.sql("SHOW TABLES IN graft_dfs.storm").collect()
      .exists(_.getString(1) == "df")
    if (table) {
      val consistent =
        try {
          DfStore.auditAdditivity(spark, s"$warehouse/storm/df",
            DfStore.nDocs(spark, "graft_dfs.storm.df"), "post-storm")
          true
        } catch { case e: IllegalArgumentException
            if e.getMessage.contains("counted twice") => false }
      assert(consistent || sentinelSeen.get(),
        "the store is corrupt but NO call reported it — the sentinel " +
          "missed a silent double count")
    }
  }

  test("chaos: free-running readers during epoch appends + compaction " +
    "folds see exactly ONE legal epoch-prefix state per read — epoch " +
    "INSERTs are atomic and folds are lossless, so (sum df, n_docs) " +
    "always lands on a prefix boundary, never between") {
    // expected (sum df, n_docs) after each epoch prefix, from direct
    // recomputes over the same slices the updates will ingest
    val wheres = Seq("doc_id % 4 = 0", "doc_id % 4 <= 1", "doc_id % 4 <= 2", "true")
    val legal: Set[(Long, Long)] = (0 to wheres.length).map { k =>
      if (k == 0) (0L, 0L)
      else {
        val slice = graft.Tables.documents(spark, sfDir)
          .filter(expr(wheres(k - 1)))
        val n = slice.count()
        val sumDf = slice
          .select(col("doc_id"), explode(array_distinct(Params.toks(col("text")))).as("t"))
          .count() // one df unit per distinct (doc, term) = the sum of dfs
        (sumDf, n)
      }
    }.toSet
    spark.sql("CALL graft_dfs.system.update_doc_freqs(table => 'ts.chaos', " +
      s"source_dir => '$sfDir', where => '${wheres.head}', autocompact => 2)")
    val anomalies = new java.util.concurrent.ConcurrentLinkedQueue[String]
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val readers = (1 to 2).map(i => new Thread(() => {
      while (!stop.get()) {
        try {
          // ONE query = one generation-listing snapshot: sum of df
          // partials and sum of n partials from the same scan
          val r = spark.table("graft_dfs.ts.chaos")
            .select(col("key").cast("string").as("k"), explode(col("columns")).as("c"))
            .select(col("k"), col("c.name").cast("string").as("n"),
              col("c.value").cast("string").as("v"))
            .agg(
              sum(when(col("k").startsWith("t:") && col("n").startsWith("df:"),
                col("v").cast("bigint")).otherwise(0L)).as("sumDf"),
              sum(when(col("k") === "_n" && col("n").startsWith("n:"),
                col("v").cast("bigint")).otherwise(0L)).as("nDocs"))
            .head()
          val got = (r.getLong(0), r.getLong(1))
          if (!legal.contains(got))
            anomalies.add(s"reader $i saw illegal state $got (legal: $legal)")
        } catch {
          // loud refusal classes are legal mid-swap outcomes; anything
          // else (wrong totals handled above) is an anomaly
          case e: Throwable =>
            val msgs = Iterator.iterate[Throwable](e)(_.getCause)
              .takeWhile(_ != null)
              .flatMap(t => Seq(t.getClass.getSimpleName) ++ Option(t.getMessage))
              .mkString(" | ")
            if (!msgs.contains("rerun") && !msgs.contains("mid-lifecycle") &&
                !msgs.contains("vanished") && !msgs.contains("FileNotFound") &&
                !e.isInstanceOf[java.io.FileNotFoundException])
              anomalies.add(s"reader $i unexpected ${e.getClass.getSimpleName}: $msgs")
        }
      }
    }, s"df-chaos-reader-$i"))
    readers.foreach(_.start())
    try {
      wheres.tail.foreach { w =>
        spark.sql("CALL graft_dfs.system.update_doc_freqs(table => 'ts.chaos', " +
          s"source_dir => '$sfDir', where => '$w', autocompact => 2)")
        spark.sql("CALL graft_dfs.system.compact(table => 'ts.chaos', " +
          "min_threshold => 2, min_size => 1)")
      }
    } finally {
      stop.set(true)
      readers.foreach(_.join(30000))
    }
    assert(anomalies.isEmpty, anomalies.toArray.mkString("\n"))
    // end state: the full corpus, exactly
    val want = directDf("true")
    assert(storedDf("ts.chaos") == want, "end state diverged after the storm")
  }

  test("consolidate_doc_freqs folds epoch partials into one cell per " +
    "row EXACTLY: totals are bit-identical before the fold, in the " +
    "fold+constituents coexistence window (raw append, no swap), after " +
    "new epochs land on top, after a re-fold, and after physical " +
    "compaction reclaims the constituents (round 15, VERDICT r14 #2)") {
    def cons() = spark.sql("CALL graft_dfs.system.consolidate_doc_freqs(" +
      "table => 'ts.cons')").head()
    val r1 = call("ts.cons", "doc_id % 3 = 0")
    call("ts.cons", "doc_id % 3 <= 1")
    val want2 = storedDf("ts.cons")
    val wantN2 = DfStore.nDocs(spark, "graft_dfs.ts.cons")
    // fold epochs 1-2 — the receipt names the covered tag; totals are
    // unchanged while fold AND constituents coexist (nothing was
    // unpublished: the fold generation is a pure append)
    val c1 = cons()
    assert(c1.getAs[Long]("rowsFolded") > 0 &&
      c1.getAs[Long]("partialsFolded") >= 2 * c1.getAs[Long]("rowsFolded"),
      c1)
    assert(c1.getAs[String]("coveredEpochTag") == "000002", c1)
    assert(storedDf("ts.cons") == want2 &&
      DfStore.nDocs(spark, "graft_dfs.ts.cons") == wantN2,
      "totals changed inside the fold+constituents window")
    // idempotent: nothing new to fold
    val c2 = cons()
    assert(c2.getAs[Long]("rowsFolded") == 0L, c2)
    // a later epoch lands ON TOP of the fold; totals = full recompute
    val r3 = call("ts.cons", "true")
    assert(r3.getAs[Int]("epoch") == 3,
      s"epoch numbering must continue across a fold: $r3")
    assert(r3.getAs[Long]("alreadyStored") == wantN2, r3)
    assert(storedDf("ts.cons") == directDf("true"),
      "fold + post-fold epoch must sum to the exact corpus df")
    // re-fold: the old fold cell is itself a foldable constituent
    val c3 = cons()
    assert(c3.getAs[Long]("rowsFolded") > 0 &&
      c3.getAs[String]("coveredEpochTag") == "000003", c3)
    assert(storedDf("ts.cons") == directDf("true"), "re-fold lost a partial")
    // physical reclamation is ORDINARY compaction: one whole-directory
    // STCS fold (large min_size groups every generation into one
    // bucket) is isolated, so tombstone GC applies — the markers
    // reclaim the constituents and row width returns to one cell per
    // prefix (the whole point: O(1) serving reads per row)
    val f = spark.sql("CALL graft_dfs.system.compact(table => 'ts.cons', " +
      "min_threshold => 2, min_size => 1073741824)").head()
    assert(f.getInt(0) == 1, s"expected one whole-directory fold: $f")
    val widths = spark.read.format("sstable").load(s"$warehouse/ts/cons")
      .filter(col("key").cast("string").startsWith("t:"))
      .select(size(col("columns")).as("w"))
      .agg(max(col("w")), count(lit(1))).head()
    assert(widths.getInt(0) == 2,
      s"a consolidated+compacted t: row must carry exactly df+cf " +
        s"(got max width ${widths.getInt(0)} over ${widths.getLong(1)} rows)")
    assert(storedDf("ts.cons") == directDf("true") &&
      DfStore.nDocs(spark, "graft_dfs.ts.cons") ==
        graft.Tables.documents(spark, sfDir).count(),
      "totals changed across physical reclamation")
    // the additivity sentinel holds over the folded store
    DfStore.auditAdditivity(spark, s"$warehouse/ts/cons",
      DfStore.nDocs(spark, "graft_dfs.ts.cons"), "post-consolidation audit")
    assert(r1 != null)
  }

  test("write-triggered AUTO-consolidation (round 16, VERDICT r15 #4): " +
    "a long-run of epochs with ZERO consolidate CALLs keeps row width " +
    "bounded by the autoconsolidate table property, with parity and " +
    "the sentinel green across every automatic fold") {
    val dir = s"$warehouse/ts/dfauto"
    def callAuto(where: String) = spark.sql(
      s"CALL graft_dfs.system.update_doc_freqs(table => 'ts.dfauto', " +
        s"source_dir => '$sfDir', where => '$where', autocompact => 3, " +
        "autoconsolidate => 3)").head()
    // 8 disjoint epochs; the operator never calls consolidate_doc_freqs
    (0 until 8).foreach(i => callAuto(s"doc_id % 8 = $i"))
    // the property landed on the store (persisted in _table)
    assert(graft.sources.sstable.spark.GraftCatalog
      .tableProps(graft.sources.sstable.LocalStorage, dir)
      .get("autoconsolidate").contains("3"))
    // at least one automatic fold ran: the _n row's live tags carry an
    // F fold cell, and the unfolded-epoch count is back under the bound
    val nTags = SSTableOps.suppressTombstones(
        spark.read.format("sstable").load(dir))
      .filter(col("key").cast("string") === "_n")
      .select(explode(col("columns")).as("c"))
      .select(col("c.name").cast("string").as("n"))
      .collect().map(_.getString(0)).filter(_.startsWith("n:"))
      .map(_.stripPrefix("n:"))
    assert(nTags.exists(_.startsWith("F")),
      s"8 epochs over autoconsolidate=3 never folded: ${nTags.sorted.mkString(", ")}")
    assert(DfStore.epochPartialsSinceFold(dir,
        graft.sources.sstable.LocalStorage) <= 3,
      "row width not bounded by the property after the last commit")
    // every LIVE t: row is bounded too: per prefix at most one fold
    // cell + the unfolded epochs (the bound the property promises)
    val maxW = SSTableOps.suppressTombstones(
        spark.read.format("sstable").load(dir))
      .filter(col("key").cast("string").startsWith("t:"))
      .select(col("key"), explode(col("columns")).as("c"))
      .filter(col("c.state") === "NORMAL")
      .select(col("key"),
        substring(col("c.name").cast("string"), 1, 3).as("p"))
      .groupBy("key", "p").agg(count(lit(1)).as("w"))
      .agg(max(col("w"))).head().getLong(0)
    assert(maxW <= 4,
      s"a live t: row carries $maxW partials per prefix — the " +
        "autoconsolidate bound (3 unfolded epochs + 1 fold) is broken")
    // parity: the automatically-folded store still serves the exact
    // full-recompute statistic, and the sentinel holds
    assert(storedDf("ts.dfauto") == directDf("true"),
      "an automatic fold lost or duplicated a partial")
    DfStore.auditAdditivity(spark, dir,
      DfStore.nDocs(spark, "graft_dfs.ts.dfauto"), "post-autoconsolidate audit")
    // autoconsolidate => 0 disables: a store created without the
    // property never folds on its own
    def callOff(where: String) = spark.sql(
      s"CALL graft_dfs.system.update_doc_freqs(table => 'ts.dfauto0', " +
        s"source_dir => '$sfDir', where => '$where', autocompact => 3, " +
        "autoconsolidate => 0)").head()
    (0 until 5).foreach(i => callOff(s"doc_id % 5 = $i"))
    val offTags = SSTableOps.suppressTombstones(
        spark.read.format("sstable").load(s"$warehouse/ts/dfauto0"))
      .filter(col("key").cast("string") === "_n")
      .select(explode(col("columns")).as("c"))
      .select(col("c.name").cast("string").as("n"))
      .collect().map(_.getString(0)).filter(_.startsWith("n:F"))
    assert(offTags.isEmpty,
      s"autoconsolidate => 0 must disable the volunteer fold: ${offTags.mkString(", ")}")
    // loud pin (ADVICE r16): on an EXISTING store a different explicit
    // bound refuses naming the pinned value instead of being silently
    // ignored (the table property always wins)
    val pinErr = intercept[Exception] { spark.sql(
      s"CALL graft_dfs.system.update_doc_freqs(table => 'ts.dfauto', " +
        s"source_dir => '$sfDir', where => 'doc_id % 8 = 0', " +
        "autocompact => 3, autoconsolidate => 5)").head() }
    assert(pinErr.getMessage.contains("pins autoconsolidate=3"),
      s"expected the pinned-bound refusal, got: ${pinErr.getMessage}")
    // ...and the pinned-at-off store refuses a late non-default bound too
    val pinErr0 = intercept[Exception] { spark.sql(
      s"CALL graft_dfs.system.update_doc_freqs(table => 'ts.dfauto0', " +
        s"source_dir => '$sfDir', where => 'doc_id % 5 = 0', " +
        "autocompact => 3, autoconsolidate => 5)").head() }
    assert(pinErr0.getMessage.contains("pins autoconsolidate=0"),
      s"expected the pinned-off refusal, got: ${pinErr0.getMessage}")
  }

  test("point-read serving (round 15): docFreqsFor / nDocsProbe fetch " +
    "exactly the asked rows — parity with the scan path bit for bit, " +
    "on a plain AND a consolidated store (the probes are fold-aware), " +
    "with never-seen terms simply absent") {
    val sp = spark
    import sp.implicits._
    // ts.df: plain epoch cells (built + compacted by the first tests)
    val want = storedDf("ts.df")
    val some = want.keys.toSeq.sorted.take(7)
    val probed = DfStore.docFreqsFor(
        (some :+ "zzq_never_a_term").toDF("term"), s"$warehouse/ts/df")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(probed == some.map(t => t -> want(t)).toMap,
      s"probe path diverged from the scan path: $probed")
    assert(DfStore.nDocsProbe(s"$warehouse/ts/df") ==
      DfStore.nDocs(spark, "graft_dfs.ts.df"))
    // ts.cons: consolidated + reclaimed — the probes must apply the
    // fold rule and serve identically
    val wantC = storedDf("ts.cons")
    val someC = wantC.keys.toSeq.sorted.take(7)
    val probedC = DfStore.docFreqsFor(someC.toDF("term"), s"$warehouse/ts/cons")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(probedC == someC.map(t => t -> wantC(t)).toMap,
      s"probe path diverged on the consolidated store: $probedC")
    assert(DfStore.nDocsProbe(s"$warehouse/ts/cons") ==
      DfStore.nDocs(spark, "graft_dfs.ts.cons"))
  }

  test("q_tfidf_probe is BIT-IDENTICAL to its scan-serving twin " +
    "(point reads of the batch's terms == the vocabulary-scan path)") {
    val twin = graft.SparkEntry.queries("q_tfidf_delta")(spark, sfDir).collect().toSeq
    val probed = graft.SparkEntry.queries("q_tfidf_probe")(spark, sfDir).collect().toSeq
    assert(twin.nonEmpty && twin == probed,
      "q_tfidf_probe diverged from q_tfidf_delta")
  }

  test("consolidate_doc_freqs runs under the maintenance lease: a held " +
    "lease refuses loudly instead of double-folding") {
    call("ts.lease", "doc_id % 9 = 0")
    call("ts.lease", "doc_id % 9 <= 1")
    val dir = s"$warehouse/ts/lease"
    val lease = graft.sources.sstable.MaintenanceLease.acquire(
      dir, graft.sources.sstable.LocalStorage, "spec-holder")
    try {
      val e = intercept[Exception](spark.sql(
        "CALL graft_dfs.system.consolidate_doc_freqs(table => 'ts.lease')"))
      def chain(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
      assert(chain(e).exists(_.contains("spec-holder")), chain(e))
    } finally lease.release()
    // released: the fold proceeds and totals stay exact
    val c = spark.sql("CALL graft_dfs.system.consolidate_doc_freqs(" +
      "table => 'ts.lease')").head()
    assert(c.getAs[Long]("rowsFolded") > 0, c)
    assert(storedDf("ts.lease") == directDf("doc_id % 9 <= 1"))
  }

  test("update_doc_freqs itself runs under the maintenance lease (round " +
    "15, VERDICT r14 #3): the epoch-pick -> probe -> append section is " +
    "check-then-act, so a concurrent updater refuses LOUDLY up front " +
    "instead of corrupting partials for the sentinel to find after") {
    call("ts.updlease", "doc_id % 11 = 0")
    val dir = s"$warehouse/ts/updlease"
    val lease = graft.sources.sstable.MaintenanceLease.acquire(
      dir, graft.sources.sstable.LocalStorage, "rogue-second-updater")
    try {
      val e = intercept[Exception](call("ts.updlease", "true"))
      def chain(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
      assert(chain(e).exists(_.contains("rogue-second-updater")), chain(e))
    } finally lease.release()
    // released: the update proceeds; totals exact; sentinel green
    val r = call("ts.updlease", "true")
    assert(r.getAs[Long]("novel") > 0, r)
    assert(storedDf("ts.updlease") == directDf("true"))
  }

  /** A scratch corpus directory holding a documents.parquet with the
    * given (doc_id, text) rows — the only way to exercise the input
    * guards, since the harness corpus has unique in-range ids. */
  private def scratchCorpus(rows: Seq[(Long, String)]): String = {
    val dir = Files.createTempDirectory("graft-df-badcorpus").toString
    import spark.implicits._
    rows.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("ADVICE r14: a duplicate-doc_id ingest slice refuses UP FRONT, " +
    "naming input duplication — not the phantom concurrent-update race " +
    "the sentinel would otherwise blame a legitimate later call for — " +
    "and writes nothing") {
    val bad = scratchCorpus(Seq(1L -> "alpha beta", 1L -> "alpha gamma",
      2L -> "delta"))
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    val e = intercept[Exception](spark.sql(
      "CALL graft_dfs.system.update_doc_freqs(table => 'ts.dup', " +
        s"source_dir => '$bad')"))
    assert(chain(e).exists(m => m.contains("duplicate doc_id") &&
      m.contains("INPUT duplication")), chain(e))
    // nothing was counted: the refusal fired before any marker/partial
    assert(DfStore.nDocs(spark, "graft_dfs.ts.dup") == 0L)
  }

  test("ADVICE r14: doc_id outside [0, 1e12) refuses BEFORE any marker " +
    "is written (an out-of-range id would round-trip wrongly through " +
    "the 12-digit marker key, be re-counted every epoch, and poison " +
    "the sentinel permanently); the store stays healthy for legal ids") {
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    for ((badId, tbl) <- Seq(-1L -> "ts.range_neg",
        1000000000000L -> "ts.range_big")) {
      val bad = scratchCorpus(Seq(badId -> "omega", 7L -> "kappa"))
      val e = intercept[Exception](spark.sql(
        s"CALL graft_dfs.system.update_doc_freqs(table => '$tbl', " +
          s"source_dir => '$bad')"))
      assert(chain(e).exists(_.contains("[0, 1e12)")), chain(e))
      // the refusal fired before any marker/partial was written
      assert(DfStore.nDocs(spark, s"graft_dfs.$tbl") == 0L)
    }
    // the boundary ids themselves (0 and 1e12 - 1) are legal
    val good = scratchCorpus(Seq(0L -> "omega", 999999999999L -> "kappa"))
    val r = spark.sql("CALL graft_dfs.system.update_doc_freqs(table => " +
      s"'ts.range_ok', source_dir => '$good')").head()
    assert(r.getAs[Long]("novel") == 2L, r)
    assert(DfStore.nDocs(spark, "graft_dfs.ts.range_ok") == 2L)
    // and they round-trip exactly through the 12-digit marker keys
    assert(DfStore.storedDocIds(spark, s"$warehouse/ts/range_ok")
      .collect().map(_.getLong(0)).toSet == Set(0L, 999999999999L))
  }

  // ── retraction (round 15) ─────────────────────────────────────────────

  private def retractCall(table: String, where: String,
                          dir: String = sfDir) = spark.sql(
    s"CALL graft_dfs.system.retract_doc_freqs(table => '$table', " +
      s"source_dir => '$dir', where => '$where')").head()

  private def chain(t: Throwable): Seq[String] =
    if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)

  test("retraction subtracts EXACTLY: retract == a store that never " +
    "counted those docs (df, cf, n_docs all bit-equal to the direct " +
    "recompute over the remaining corpus); an idempotent re-retract is " +
    "a receipt-visible no-op; and a later ingest RE-ADMITS the docs — " +
    "end state equals the original full store") {
    call("ts.ret", "doc_id % 3 < 2")
    call("ts.ret", "true")
    val full = storedDf("ts.ret")
    val fullN = DfStore.nDocs(spark, "graft_dfs.ts.ret")
    assert(full == directDf("true"))
    val r = retractCall("ts.ret", "doc_id % 5 = 2")
    assert(r.getAs[Long]("retracted") > 0 &&
      r.getAs[Long]("notStored") == 0L, r)
    // served statistics equal a corpus that never held the slice
    assert(storedDf("ts.ret") == directDf("NOT (doc_id % 5 = 2)"),
      "retracted df diverged from the direct recompute")
    assert(DfStore.nDocs(spark, "graft_dfs.ts.ret") ==
      fullN - r.getAs[Long]("retracted"))
    // cf too: collection frequency subtracts by the same argument
    val cfDirect = graft.Tables.documents(spark, sfDir)
      .filter(expr("NOT (doc_id % 5 = 2)"))
      .select(explode(Params.toks(col("text"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cf"))
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(DfStore.collFreqs(spark, "graft_dfs.ts.ret")
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap == cfDirect)
    // idempotent: the docs are no longer members, so nothing matches
    val r2 = retractCall("ts.ret", "doc_id % 5 = 2")
    assert(r2.getAs[Long]("retracted") == 0L &&
      r2.getAs[Int]("epoch") == 0, r2)
    assert(storedDf("ts.ret") == directDf("NOT (doc_id % 5 = 2)"))
    // re-admission: the membership probe is delete-aware, so an ingest
    // over the full corpus counts EXACTLY the retracted docs again
    val r3 = call("ts.ret", "true")
    assert(r3.getAs[Long]("novel") == r.getAs[Long]("retracted"), r3)
    assert(storedDf("ts.ret") == full, "re-admitted state != original")
    assert(DfStore.nDocs(spark, "graft_dfs.ts.ret") == fullN)
  }

  test("retraction composes with consolidation: negative partials fold " +
    "like positive ones (the fold rule is sign-blind), totals stay " +
    "bit-exact through fold + reclamation, and the store keeps serving " +
    "the remaining corpus exactly") {
    call("ts.retc", "doc_id % 2 = 0")
    call("ts.retc", "true")
    retractCall("ts.retc", "doc_id % 4 = 1")
    val want = directDf("NOT (doc_id % 4 = 1)")
    assert(storedDf("ts.retc") == want)
    val c = spark.sql(
      "CALL graft_dfs.system.consolidate_doc_freqs(table => 'ts.retc')").head()
    assert(c.getAs[Long]("rowsFolded") > 0, c)
    assert(storedDf("ts.retc") == want, "fold over negatives diverged")
    // physical reclamation keeps the totals too
    SSTableOps.compactInPlace(spark, s"$warehouse/ts/retc", minThreshold = 2)
    assert(storedDf("ts.retc") == want, "post-compaction totals diverged")
    val n = graft.Tables.documents(spark, sfDir)
      .filter(expr("NOT (doc_id % 4 = 1)")).count()
    assert(DfStore.nDocs(spark, "graft_dfs.ts.retc") == n)
  }

  test("retraction refuses when the corpus text drifted since ingest " +
    "(content-hash mismatch): subtracting the CURRENT text's counts " +
    "would corrupt the statistics silently — and the refusal writes " +
    "nothing") {
    val dir = scratchCorpus(Seq(1L -> "alpha beta", 2L -> "gamma delta"))
    spark.sql("CALL graft_dfs.system.update_doc_freqs(table => " +
      s"'ts.drift', source_dir => '$dir')")
    val before = storedDf("ts.drift")
    // the source mutates under the store: doc 1's text changes
    import spark.implicits._
    Seq(1L -> "alpha CHANGED", 2L -> "gamma delta").toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val e = intercept[Exception](retractCall("ts.drift", "doc_id = 1", dir))
    assert(chain(e).exists(m => m.contains("content-hash mismatch") &&
      m.contains("doc_id(s) 1")), chain(e))
    assert(storedDf("ts.drift") == before, "a refused retraction must " +
      "leave the store untouched")
    // the unchanged doc still retracts fine
    val r = retractCall("ts.drift", "doc_id = 2", dir)
    assert(r.getAs[Long]("retracted") == 1L, r)
    assert(storedDf("ts.drift") == Map("alpha" -> 1L, "beta" -> 1L))
  }

  test("retraction refuses a STREAM-maintained store loudly: a " +
    "batch-numbered retraction epoch would sort before the stream's " +
    "s-tags and be silently excluded by the fold rule after the next " +
    "consolidation") {
    // a catalog table whose statistics a stream then maintains — the
    // single-maintainer misuse the refusal exists to catch
    call("ts.strm", "doc_id % 11 = 0")
    graft.streaming.StreamingDfUpdate.processBatch(
      graft.Tables.documents(spark, sfDir).filter(expr("doc_id % 11 = 1"))
        .select(col("doc_id"), col("text")),
      s"$warehouse/ts/strm", epochId = 7L)
    val e = intercept[Exception](retractCall("ts.strm", "doc_id % 11 = 0"))
    assert(chain(e).exists(_.contains("STREAM-maintained")), chain(e))
    // the refusal points at the stream-domain path — whose own mirror
    // guard refuses THIS store too (numeric batch tags present): a
    // hybrid-maintained store is retraction-proof in both directions
    // until its tag history is single-domain again
    val e2 = intercept[Exception](DfStore.retractStream(spark,
      s"$warehouse/ts/strm", sfDir, "doc_id % 11 = 0"))
    assert(chain(e2).exists(_.contains("BATCH-maintained")), chain(e2))
  }

  test("retraction's sufficiency guard: a marker whose doc the store " +
    "never actually counted (forged membership — the corruption class) " +
    "refuses BEFORE totals could go negative, naming the terms") {
    val dir = scratchCorpus(Seq(1L -> "alpha beta", 2L -> "zebra yonder"))
    spark.sql("CALL graft_dfs.system.update_doc_freqs(table => " +
      s"'ts.suff', source_dir => '$dir', where => 'doc_id = 1')")
    // forge a live marker for doc 2 with the CORRECT content hash but
    // no term partials behind it
    val h = spark.sql("SELECT md5('zebra yonder')").head().getString(0)
    def cellSql(name: String, v: String) =
      s"named_struct('name', CAST('$name' AS BINARY), 'state', 'NORMAL', " +
        s"'value', CAST('$v' AS BINARY), 'timestamp', CAST(2 AS BIGINT), " +
        "'ttlSecs', CAST(0 AS BIGINT), 'expiresMillis', CAST(0 AS BIGINT))"
    val noTomb = "CAST(NULL AS STRUCT<localDeletionTime: INT, markedForDeleteAt: BIGINT>)"
    spark.sql("INSERT INTO graft_dfs.ts.suff VALUES " +
      s"(CAST('d:${"%012d".format(2)}' AS BINARY), " +
      s"array(${cellSql("e", "2")}, ${cellSql("h", h)}), $noTomb), " +
      s"(CAST('_n' AS BINARY), array(${cellSql("n:000002", "1")}), $noTomb)")
    val e = intercept[Exception](retractCall("ts.suff", "doc_id = 2", dir))
    assert(chain(e).exists(m => m.contains("cannot cover") &&
      (m.contains("zebra") || m.contains("yonder"))), chain(e))
  }

  test("retraction refuses markers that predate content hashes (no h " +
    "cell): without the hash there is no way to verify the subtraction " +
    "matches what was counted") {
    val dir = scratchCorpus(Seq(1L -> "alpha beta"))
    spark.sql("CALL graft_dfs.system.update_doc_freqs(table => " +
      s"'ts.noh', source_dir => '$dir', where => 'doc_id < 0')")
    // forge a pre-retraction-era marker: e cell only, no h
    def cellSql(name: String, v: String) =
      s"named_struct('name', CAST('$name' AS BINARY), 'state', 'NORMAL', " +
        s"'value', CAST('$v' AS BINARY), 'timestamp', CAST(1 AS BIGINT), " +
        "'ttlSecs', CAST(0 AS BIGINT), 'expiresMillis', CAST(0 AS BIGINT))"
    val noTomb = "CAST(NULL AS STRUCT<localDeletionTime: INT, markedForDeleteAt: BIGINT>)"
    spark.sql("INSERT INTO graft_dfs.ts.noh VALUES " +
      s"(CAST('d:${"%012d".format(1)}' AS BINARY), " +
      s"array(${cellSql("e", "1")}), $noTomb), " +
      s"(CAST('_n' AS BINARY), array(${cellSql("n:000001", "1")}), $noTomb)")
    val e = intercept[Exception](retractCall("ts.noh", "doc_id = 1", dir))
    assert(chain(e).exists(_.contains("no content hash")), chain(e))
  }

  test("retraction lands cleanly ON TOP of a consolidated store — the " +
    "negative epoch nets against the fold cell under the shared fold " +
    "rule, and the point-read serving path (docFreqsFor / nDocsProbe) " +
    "agrees with the scan path bit for bit on the retracted state") {
    call("ts.cret", "doc_id % 2 = 0")
    call("ts.cret", "true")
    val c = spark.sql(
      "CALL graft_dfs.system.consolidate_doc_freqs(table => 'ts.cret')").head()
    assert(c.getAs[Long]("rowsFolded") > 0, c)
    val r = retractCall("ts.cret", "doc_id % 6 = 1")
    assert(r.getAs[Long]("retracted") > 0, r)
    val want = directDf("NOT (doc_id % 6 = 1)")
    assert(storedDf("ts.cret") == want,
      "retraction over a consolidated store diverged")
    // probe == scan on the retracted+consolidated state: point reads of
    // every surviving term net the fold cell against the negatives too
    import spark.implicits._
    val dir = s"$warehouse/ts/cret"
    val probed = DfStore.docFreqsFor(
        want.keys.toSeq.toDF("term"), dir)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(probed == want, "the point-read path diverged from the scan")
    // a fully-retracted term must not serve from the probe path either:
    // probe every term the FULL corpus had; the retracted-only ones drop
    val allTerms = directDf("true").keys.toSeq
    val probedAll = DfStore.docFreqsFor(allTerms.toDF("term"), dir)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(probedAll == want,
      "fully-retracted terms leaked through the probe path")
  }

  test("the retract / re-admit / re-retract cycle is stable: membership " +
    "flips back and forth in epoch order (DELETED then fresh NORMAL " +
    "then DELETED cells), totals land exactly each time, and the " +
    "sentinel stays green throughout") {
    call("ts.cycle", "true")
    val full = storedDf("ts.cycle")
    val without = directDf("NOT (doc_id % 5 = 2)")
    val r1 = retractCall("ts.cycle", "doc_id % 5 = 2")
    assert(r1.getAs[Long]("retracted") > 0, r1)
    assert(storedDf("ts.cycle") == without)
    val re = call("ts.cycle", "true")
    assert(re.getAs[Long]("novel") == r1.getAs[Long]("retracted"), re)
    assert(storedDf("ts.cycle") == full)
    val r2 = retractCall("ts.cycle", "doc_id % 5 = 2")
    assert(r2.getAs[Long]("retracted") == r1.getAs[Long]("retracted"), r2)
    assert(storedDf("ts.cycle") == without)
    // compaction folds the whole marker history (NORMAL, DELETED,
    // NORMAL, DELETED per cycled doc) to the newest state exactly
    SSTableOps.compactInPlace(spark, s"$warehouse/ts/cycle", minThreshold = 2)
    assert(storedDf("ts.cycle") == without,
      "post-compaction cycled state diverged")
    DfStore.auditAdditivity(spark, s"$warehouse/ts/cycle",
      DfStore.nDocs(spark, "graft_dfs.ts.cycle"), "post-cycle audit")
  }

  test("storm: retract_doc_freqs racing update + DROP+undrop never " +
    "corrupts SILENTLY — the delete-aware sentinel owns the retracted " +
    "store's end state exactly like the raw check owns the append-only " +
    "store's") {
    spark.sql("CREATE NAMESPACE graft_dfs.rstorm")
    spark.sql("CALL graft_dfs.system.update_doc_freqs(table => " +
      s"'rstorm.df', source_dir => '$sfDir', where => 'true', " +
      "autocompact => 3)")
    val sentinelSeen = new java.util.concurrent.atomic.AtomicBoolean(false)
    val anomalies = new java.util.concurrent.ConcurrentLinkedQueue[String]
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    def legal(msgs: String): Boolean =
      msgs.contains("rerun") || msgs.contains("mid-lifecycle") ||
        msgs.contains("vanished") || msgs.contains("FileNotFound") ||
        msgs.contains("does not exist") || msgs.contains("No such file") ||
        msgs.contains("TABLE_OR_VIEW_NOT_FOUND") || msgs.contains("not found") ||
        msgs.contains("lease") || msgs.contains("exists") ||
        msgs.contains("no data and no _table pointer") ||
        msgs.contains("ONE corpus") || msgs.contains("one unit") ||
        msgs.contains("residue") || msgs.contains("dropped") ||
        msgs.contains("restoring") || msgs.contains("nothing to retract") ||
        msgs.contains("no content hash")
    val maintainer = new Thread(() => {
      var i = 0
      while (!stop.get()) {
        i += 1
        val retractPass = i % 2 == 0
        try {
          if (retractPass)
            spark.sql("CALL graft_dfs.system.retract_doc_freqs(table => " +
              s"'rstorm.df', source_dir => '$sfDir', " +
              s"where => 'doc_id % 5 = ${i % 5}')")
          else
            spark.sql("CALL graft_dfs.system.update_doc_freqs(table => " +
              s"'rstorm.df', source_dir => '$sfDir', autocompact => 3)")
        } catch {
          case e: Throwable =>
            val msgs = Iterator.iterate[Throwable](e)(_.getCause)
              .takeWhile(_ != null)
              .flatMap(t => Seq(t.getClass.getSimpleName) ++ Option(t.getMessage))
              .mkString(" | ")
            if (msgs.contains("counted twice") ||
                msgs.contains("counted or retracted twice")) sentinelSeen.set(true)
            else if (!legal(msgs))
              anomalies.add(s"maintainer unexpected ${e.getClass.getSimpleName}: $msgs")
        }
      }
    }, "df-rstorm-maintainer")
    maintainer.start()
    try {
      for (_ <- 1 to 6) {
        try {
          spark.sql("DROP TABLE graft_dfs.rstorm.df")
          spark.sql("CALL graft_dfs.system.undrop_table(table => 'rstorm.df')")
        } catch {
          case e: Throwable =>
            val msgs = Iterator.iterate[Throwable](e)(_.getCause)
              .takeWhile(_ != null)
              .flatMap(t => Seq(t.getClass.getSimpleName) ++ Option(t.getMessage))
              .mkString(" | ")
            if (!legal(msgs))
              anomalies.add(s"ddl unexpected ${e.getClass.getSimpleName}: $msgs")
        }
        Thread.sleep(50)
      }
    } finally {
      stop.set(true)
      maintainer.join(60000)
    }
    assert(anomalies.isEmpty, anomalies.toArray.mkString("\n"))
    val table = spark.sql("SHOW TABLES IN graft_dfs.rstorm").collect()
      .exists(_.getString(1) == "df")
    if (table) {
      val consistent =
        try {
          DfStore.auditAdditivity(spark, s"$warehouse/rstorm/df",
            DfStore.nDocs(spark, "graft_dfs.rstorm.df"), "post-storm")
          true
        } catch { case e: IllegalArgumentException
            if e.getMessage.contains("twice") => false }
      assert(consistent || sentinelSeen.get(),
        "the store is corrupt but NO call reported it — the sentinel " +
          "missed a silent double count/retract")
    }
  }

  test("TAKEDOWN-dir retraction: a doc already DELETED from the corpus " +
    "retracts from any directory holding its (doc_id, text) rows — the " +
    "content-hash check proves the text is what the store counted, " +
    "which is strictly stronger than a source-directory pin; tampered " +
    "takedown payloads refuse") {
    val corpus = scratchCorpus(Seq(1L -> "alpha beta", 2L -> "gamma delta",
      3L -> "epsilon zeta"))
    spark.sql("CALL graft_dfs.system.update_doc_freqs(table => " +
      s"'ts.take', source_dir => '$corpus')")
    // the takedown: doc 3 is REMOVED from the corpus entirely (the
    // usual real-world order — content comes down first, statistics
    // must follow without it)
    import spark.implicits._
    Seq(1L -> "alpha beta", 2L -> "gamma delta").toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$corpus/documents.parquet")
    // retracting from the (now doc-3-less) corpus finds nothing…
    val r0 = retractCall("ts.take", "doc_id = 3", corpus)
    assert(r0.getAs[Long]("docsInSlice") == 0L, r0)
    // …but the takedown payload itself carries the removed content
    val payload = scratchCorpus(Seq(3L -> "epsilon zeta"))
    val r = retractCall("ts.take", "true", payload)
    assert(r.getAs[Long]("retracted") == 1L, r)
    assert(storedDf("ts.take") ==
      Map("alpha" -> 1L, "beta" -> 1L, "gamma" -> 1L, "delta" -> 1L))
    assert(DfStore.nDocs(spark, "graft_dfs.ts.take") == 2L)
    // a TAMPERED payload (doc 2 with altered text) refuses on the hash
    val forged = scratchCorpus(Seq(2L -> "gamma TAMPERED"))
    val e = intercept[Exception](retractCall("ts.take", "true", forged))
    assert(chain(e).exists(_.contains("content-hash mismatch")), chain(e))
  }

  test("CALL audit_doc_freqs exposes the sentinel on demand: a healthy " +
    "store (append-only AND retracted) returns matching counts; a " +
    "forged duplicate marker raises the same loud diagnosis the " +
    "maintainers do") {
    val dir = scratchCorpus(Seq(1L -> "alpha beta", 2L -> "gamma delta",
      3L -> "epsilon zeta"))
    spark.sql("CALL graft_dfs.system.update_doc_freqs(table => " +
      s"'ts.auditcall', source_dir => '$dir')")
    val a1 = spark.sql(
      "CALL graft_dfs.system.audit_doc_freqs(table => 'ts.auditcall')").head()
    assert(a1.getAs[Long]("nDocs") == 3L &&
      a1.getAs[Long]("liveMarkers") == 3L &&
      a1.getAs[Boolean]("consistent"), a1)
    retractCall("ts.auditcall", "doc_id = 2", dir)
    val a2 = spark.sql(
      "CALL graft_dfs.system.audit_doc_freqs(table => 'ts.auditcall')").head()
    assert(a2.getAs[Long]("nDocs") == 2L &&
      a2.getAs[Long]("liveMarkers") == 2L, a2)
    // forge the corruption: a duplicate live marker without a partial
    def cellSql(name: String, v: String) =
      s"named_struct('name', CAST('$name' AS BINARY), 'state', 'NORMAL', " +
        s"'value', CAST('$v' AS BINARY), 'timestamp', CAST(99 AS BIGINT), " +
        "'ttlSecs', CAST(0 AS BIGINT), 'expiresMillis', CAST(0 AS BIGINT))"
    val noTomb = "CAST(NULL AS STRUCT<localDeletionTime: INT, markedForDeleteAt: BIGINT>)"
    spark.sql("INSERT INTO graft_dfs.ts.auditcall VALUES " +
      s"(CAST('d:${"%012d".format(7)}' AS BINARY), " +
      s"array(${cellSql("e", "99")}), $noTomb)")
    val e = intercept[Exception](spark.sql(
      "CALL graft_dfs.system.audit_doc_freqs(table => 'ts.auditcall')")
      .head())
    assert(chain(e).exists(_.contains("INCONSISTENT")), chain(e))
  }

  test("retraction is unit-agnostic: a 'para' store (boilerplate " +
    "statistics) subtracts paragraph-digest counts exactly, and a " +
    "mismatched-unit retraction refuses") {
    val dir = scratchCorpus(Seq(
      1L -> "the same exact boiler plate text here plus one",
      2L -> "the same exact boiler plate text here plus two",
      3L -> "fresh novel words all their own here also four"))
    spark.sql("CALL graft_dfs.system.update_doc_freqs(table => " +
      s"'ts.para', source_dir => '$dir', unit => 'para')")
    def paraDf(where: String): Map[String, Long] =
      graft.Tables.documents(spark, dir).filter(expr(where))
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
        .groupBy(col("doc_id"), floor(col("pos") / Params.ParaWords))
        .agg(array_join(transform(array_sort(collect_list(
          struct(col("pos"), col("word")))), x => x.getField("word")), " ")
          .as("para"))
        .select(col("doc_id"), md5(col("para")).as("t"))
        .groupBy("t").agg(count(lit(1)).as("df"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(DfStore.docFreqs(spark, "graft_dfs.ts.para")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
      paraDf("true"))
    // wrong unit refuses before anything lands
    val e = intercept[Exception](spark.sql(
      "CALL graft_dfs.system.retract_doc_freqs(table => 'ts.para', " +
        s"source_dir => '$dir', where => 'doc_id = 2')"))
    assert(chain(e).exists(_.contains("'para'")), chain(e))
    // the para retraction subtracts the digest counts exactly
    val r = spark.sql("CALL graft_dfs.system.retract_doc_freqs(" +
      "table => 'ts.para', source_dir => " +
      s"'$dir', where => 'doc_id = 2', unit => 'para')").head()
    assert(r.getAs[Long]("retracted") == 1L, r)
    assert(DfStore.docFreqs(spark, "graft_dfs.ts.para")
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap ==
      paraDf("doc_id <> 2"),
      "para retraction diverged from the remaining-corpus recompute")
  }

  test("the streaming scorer follows retraction: a retract_doc_freqs " +
    "epoch landing between micro-batches REDUCES the statistics the " +
    "next batch scores against — point-read serving nets the negative " +
    "partials exactly (the serving faces of retraction and streaming " +
    "compose)") {
    val dir0 = scratchCorpus(Seq(1L -> "alpha beta", 2L -> "alpha gamma",
      3L -> "beta zeta"))
    spark.sql("CALL graft_dfs.system.update_doc_freqs(table => " +
      s"'ts.score', source_dir => '$dir0')")
    val storeDir = s"$warehouse/ts/score"
    import spark.implicits._
    val probe = Seq(20L -> "beta beta").toDF("doc_id", "text")
    val before = graft.streaming.StreamingTfIdfScore
      .scoreBatch(probe, storeDir).select("score_e4").head().getLong(0)
    // n=3, df(beta)=2, tf=2 -> (2*3*10000) div 2 = 30000
    assert(before == 30000L, before)
    retractCall("ts.score", "doc_id = 3", dir0)
    val after = graft.streaming.StreamingTfIdfScore
      .scoreBatch(probe, storeDir).select("score_e4").head().getLong(0)
    // n=2, df(beta)=1 -> (2*2*10000) div 1 = 40000
    assert(after == 40000L,
      s"the next micro-batch must score against the RETRACTED " +
        s"statistics, got $after")
  }

  test("the additivity sentinel stays armed on a RETRACTED store (the " +
    "delete-aware form): a duplicating interleave after a retraction " +
    "still refuses loudly on the epoch that caused it") {
    val dir = scratchCorpus(Seq(1L -> "alpha beta", 2L -> "gamma delta",
      3L -> "epsilon zeta"))
    spark.sql("CALL graft_dfs.system.update_doc_freqs(table => " +
      s"'ts.retaudit', source_dir => '$dir')")
    retractCall("ts.retaudit", "doc_id = 3", dir)
    // forge the race's outcome: a duplicate marker for a still-live doc
    // plus its stray n-partial — live markers (2) != Σ n (3)
    def cellSql(name: String, v: String) =
      s"named_struct('name', CAST('$name' AS BINARY), 'state', 'NORMAL', " +
        s"'value', CAST('$v' AS BINARY), 'timestamp', CAST(99 AS BIGINT), " +
        "'ttlSecs', CAST(0 AS BIGINT), 'expiresMillis', CAST(0 AS BIGINT))"
    val noTomb = "CAST(NULL AS STRUCT<localDeletionTime: INT, markedForDeleteAt: BIGINT>)"
    spark.sql("INSERT INTO graft_dfs.ts.retaudit VALUES " +
      s"(CAST('d:${"%012d".format(1)}' AS BINARY), " +
      s"array(${cellSql("e", "99")}), $noTomb), " +
      s"(CAST('_n' AS BINARY), array(${cellSql("n:000099", "1")}), $noTomb)")
    val e = intercept[Exception](spark.sql(
      "CALL graft_dfs.system.update_doc_freqs(table => 'ts.retaudit', " +
        s"source_dir => '$dir')"))
    assert(chain(e).exists(_.contains("counted or retracted twice")),
      chain(e))
  }
}
