package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import Params._

/** Training-data-pipeline operators beyond the text/dedup/similarity
  * families: temporal joins (as-of, interval containment) and corpus
  * curation (repetition scoring, deterministic split assignment,
  * token-budget shard packing, exact group quantiles).
  *
  * Scale notes per query:
  *  - q_asof_join: [[TemporalJoins.asOf]] — one shuffle on the key, no
  *    inequality join (which would be a BNLJ).
  *  - q_interval_join: [[TemporalJoins.intervalJoinBucketed]] — coarse
  *    time-bucket equi-join with residual containment filter; interval
  *    derivation reuses the stitched gap bucketing (no global window).
  *  - q_repetition: narrow per-doc (native `word_shingles` + array ops),
  *    zero shuffles before the final sort — streams at 100 TB.
  *  - q_sample_split: narrow hash-mod assignment + one hash-agg.
  *  - q_shard_pack: cumulative-sum windows partitioned by a hash bucket —
  *    parallel packing streams, never a global window; at 100 TB the
  *    bucket count scales with the cluster, shards stay reproducible
  *    because the hash and the in-bucket order are deterministic.
  *  - q_quantiles: exact rank-statistic percentiles in counting-sort
  *    form — the value at rank r depends only on the value DISTRIBUTION,
  *    so the full data passes through one map-side-combinable hash-agg
  *    on (lang, tok) and the cumulative windows run over the tiny
  *    distinct-value relation only. No per-stratum full-row sort
  *    anywhere: a hot language at 100 TB costs a hash-agg (parallel by
  *    key), and the per-lang window sorts at most #distinct document
  *    lengths rows — bounded by max doc length, not corpus size.
  *    Exactness is the point (bit-identical across engines, unlike
  *    interpolated percentiles); `approx_percentile` (t-digest) remains
  *    the one-pass alternative when even the distinct-value relation is
  *    too wide (continuous-valued metrics).
  */
object PipelineQueries {

  private def docToks = toks(col("text"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // As-of join: each purchase picks up the latest signup at-or-before
    // it for the same user (point-in-time-correct feature lookup).
    "q_asof_join" -> ((s, d) => {
      val e = Tables.events(s, d)
      val purchases = e.filter(col("event_type") === "purchase")
        .select("user_id", "event_id", "ts_ms")
      val signups = e.filter(col("event_type") === "signup")
        .groupBy("user_id", "ts_ms")
        .agg(max("event_id").as("signup_event_id"))
        .withColumnRenamed("ts_ms", "signup_ts_ms")
      TemporalJoins.asOf(purchases, signups, Seq("user_id"), "ts_ms", "signup_ts_ms")
        .select(col("user_id"), col("event_id"), col("ts_ms"),
          coalesce(col("signup_ts_ms"), lit(-1L)).as("signup_ts_ms"),
          coalesce(col("signup_event_id"), lit(-1L)).as("signup_event_id"))
        .orderBy("user_id", "ts_ms", "event_id")
    }),
    // Forward as-of with tolerance: each purchase picks up the EARLIEST
    // signup at-or-after it, but only within the tolerance window — a
    // farther match is a miss (pandas merge_asof semantics).
    "q_asof_forward" -> ((s, d) => {
      val e = Tables.events(s, d)
      val purchases = e.filter(col("event_type") === "purchase")
        .select("user_id", "event_id", "ts_ms")
      val signups = e.filter(col("event_type") === "signup")
        .groupBy("user_id", "ts_ms")
        .agg(max("event_id").as("signup_event_id"))
        .withColumnRenamed("ts_ms", "signup_ts_ms")
      TemporalJoins.asOf(purchases, signups, Seq("user_id"), "ts_ms", "signup_ts_ms",
          direction = "forward", toleranceMs = Some(AsOfToleranceMs))
        .select(col("user_id"), col("event_id"), col("ts_ms"),
          coalesce(col("signup_ts_ms"), lit(-1L)).as("signup_ts_ms"),
          coalesce(col("signup_event_id"), lit(-1L)).as("signup_event_id"))
        .orderBy("user_id", "ts_ms", "event_id")
    }),
    // Interval-containment join: non-error events attributed to the
    // disjoint "incident window" (error burst ± pad) containing them.
    "q_interval_join" -> ((s, d) => {
      val e = Tables.events(s, d)
      val errors = e.filter(col("event_type") === "error").select("ts_ms")
      val intervals = WideRowOps
        .gapBucketsStitched(errors, "ts_ms", SplitGapMs, coarseMs = 86400000L)
        .groupBy("bucket")
        .agg(min("ts_ms").as("start_ms"),
          (max("ts_ms") + lit(IncidentPadMs)).as("end_ms"))
        .select("start_ms", "end_ms")
      val points = e.filter(col("event_type") =!= "error")
        .select(col("user_id"), col("ts_ms").as("ev_ms"), e2(col("value")).as("value_e2"))
      TemporalJoins.intervalJoinBucketed(intervals, points,
          "start_ms", "end_ms", "ev_ms", IntervalBucketMs)
        .groupBy("start_ms", "end_ms")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          sum(col("value_e2")).as("value_sum_e2"))
        .orderBy("start_ms")
    }),
    // Repetition / boilerplate scoring: duplicated-shingle and
    // duplicated-token fractions per document (Gopher-style quality rule).
    "q_repetition" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          graft.functions.TextExpressions.word_shingles(col("text"), ShingleN).as("sh"),
          docToks.as("tk"))
        .select(col("doc_id"),
          size(col("sh")).cast("long").as("n_shingles"),
          size(array_distinct(col("sh"))).cast("long").as("n_distinct_shingles"),
          size(col("tk")).cast("long").as("n_tokens"),
          size(array_distinct(col("tk"))).cast("long").as("n_distinct_tokens"))
        .select(col("doc_id"), col("n_shingles"), col("n_distinct_shingles"),
          col("n_tokens"), col("n_distinct_tokens"),
          when(col("n_shingles") > 0,
            e4(lit(1.0) - col("n_distinct_shingles").cast("double") / col("n_shingles")))
            .otherwise(lit(0L)).as("dup_shingle_frac_e4"))
        .orderBy("doc_id")
    }),
    // Deterministic train/val/test assignment by content-independent hash
    // (stable under reruns and repartitioning), summarized per split+lang.
    "q_sample_split" -> ((s, d) => {
      val h = pmod(md5Long(col("doc_id").cast("string"), 8), lit(100))
      Tables.documents(s, d)
        .select(col("lang"), size(docToks).cast("long").as("tok"),
          when(h < SampleTrainPct, "train")
            .when(h < SampleValPct, "val").otherwise("test").as("split"))
        .groupBy("split", "lang")
        .agg(count(lit(1)).as("n_docs"), sum("tok").as("n_tokens"))
        .orderBy("split", "lang")
    }),
    // Token-budget shard packing: docs hash into independent packing
    // streams; greedy exclusive-prefix-sum packing to the token budget.
    "q_shard_pack" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), size(docToks).cast("long").as("tok"))
        .withColumn("bucket", pmod(md5Long(col("doc_id").cast("string"), 8),
          lit(ShardBuckets.toLong)))
      val w = Window.partitionBy("bucket").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      docs.withColumn("cum", sum("tok").over(w))
        .withColumn("shard", expr(s"(cum - tok) div $ShardTokenBudget"))
        .groupBy("bucket", "shard")
        .agg(count(lit(1)).as("n_docs"), sum("tok").as("n_tokens"),
          min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
        .orderBy("bucket", "shard")
    }),
    // Benchmark decontamination: flag training docs whose shingle overlap
    // with the held-out eval set exceeds the threshold. The eval shingle
    // set is tiny → broadcast; the training side is one linear pass +
    // hash-agg (no shuffle of the eval side, no pairwise doc join).
    "q_decontaminate" -> ((s, d) => {
      val sh = Tables.documents(s, d).select(col("doc_id"),
        explode(array_distinct(
          graft.functions.TextExpressions.word_shingles(col("text"), ShingleN))).as("sh"))
      val eval_ = sh.filter(col("doc_id") < EvalDocIds).select("sh").distinct()
      val train = sh.filter(col("doc_id") >= EvalDocIds)
      // ONE corpus shingle pass (r19, guide §1.2): the eval set is
      // DISTINCT, so a broadcast left join marks each train shingle
      // (never duplicates it) and a single per-doc aggregation counts
      // totals + overlaps together — the r18 shape exploded the corpus
      // twice (a semi-join overlap count and a separate totals agg,
      // stitched by a third join)
      train.join(broadcast(eval_.withColumn("hit", lit(1))), Seq("sh"), "left")
        .groupBy("doc_id").agg(count(lit(1)).as("n_shingles"),
          count(col("hit")).as("n_overlap"))
        .withColumn("contam_e4",
          e4(col("n_overlap").cast("double") / col("n_shingles")))
        .withColumn("flagged",
          (col("contam_e4") > ContamThresholdE4).cast("boolean"))
        .orderBy("doc_id")
    }),
    // Curation filter chain: first failing rule names the drop reason —
    // the end-to-end keep/drop decision built from the quality signals
    // (length bounds, repetition, stopword ratio). Narrow per-doc
    // scoring + one tiny summary agg.
    "q_curation_filter" -> ((s, d) => {
      val t = Tables.documents(s, d)
        .select(col("doc_id"), docToks.as("tk"),
          graft.functions.TextExpressions.word_shingles(col("text"), ShingleN).as("sh"))
        .select(col("doc_id"),
          size(col("tk")).cast("long").as("n_tok"),
          size(filter(col("tk"), x => x.isin(Stopwords: _*))).cast("long").as("n_stop"),
          size(col("sh")).cast("long").as("n_sh"),
          size(array_distinct(col("sh"))).cast("long").as("n_dsh"))
      val reason = when(col("n_tok") < 5, "too_short")
        .when(col("n_tok") > 1000, "too_long")
        .when(col("n_sh") > 0 &&
          (lit(1.0) - col("n_dsh").cast("double") / col("n_sh")) > 0.6, "repetitive")
        .when(col("n_stop").cast("double") / col("n_tok") < EnRatioThreshold, "low_stopword")
        .otherwise("kept")
      t.select(reason.as("reason"))
        .groupBy("reason").agg(count(lit(1)).as("n_docs"))
        .orderBy("reason")
    }),
    // Temperature-scaled domain-mixture sampling — the data-mix pass of
    // every multi-domain pretraining corpus: per-source quotas are
    // min(n, ceil(C·sqrt(n))) (α=0.5 upweights rare domains relative to
    // proportional sampling; see Params.MixTempC for why this form is
    // bit-deterministic across engines), selection within a domain is
    // hash-ordered (rerun-stable pseudo-random). Scale shape: quotas are
    // a tiny per-domain broadcast relation; selection is one per-domain
    // window — shuffle on the domain key only, never a global sort.
    "q_mix_sample" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val quotas = docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
        .withColumn("quota",
          least(col("n_docs"), ceil(sqrt(col("n_docs")) * MixTempC)))
      val h = md5Long(col("doc_id").cast("string"), 8)
      val w = Window.partitionBy("source").orderBy(col("h"), col("doc_id"))
      docs.select(col("doc_id"), col("source"), h.as("h"))
        .withColumn("rn", row_number().over(w))
        .join(broadcast(quotas), "source")
        .filter(col("rn") <= col("quota"))
        .select("source", "doc_id")
        .orderBy("source", "doc_id")
    }),
    // Deterministic stratified sampling: exactly min(K, |stratum|) docs
    // per language, chosen by hash order — a balanced, rerun-stable
    // uniform sample without replacement. One shuffle on the stratum
    // key; stratum skew is bounded by the per-language row counts.
    "q_stratified" -> ((s, d) => {
      val h = md5Long(col("doc_id").cast("string"), 8)
      val w = Window.partitionBy("lang").orderBy(col("h"), col("doc_id"))
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), h.as("h"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= StratumK)
        .select("lang", "doc_id")
        .orderBy("lang", "doc_id")
    }),
    // Exact per-group rank-statistic percentiles (p50/p90 token counts):
    // deterministic discrete percentile — value at rank ceil(q·n) —
    // computed counting-sort style: aggregate (lang, tok) counts first
    // (the only pass over full rows, map-side combinable), then find the
    // value whose cumulative-count range covers the target rank. The
    // row_number formulation's per-stratum full sort is gone: windows
    // here see one row per DISTINCT token count, not one per document.
    "q_quantiles" -> ((s, d) => {
      val t = Tables.documents(s, d)
        .select(col("lang"), size(docToks).cast("long").as("tok"))
      val counts = t.groupBy("lang", "tok").agg(count(lit(1)).as("c"))
      val wc = Window.partitionBy("lang").orderBy("tok")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      counts
        .withColumn("cum", sum("c").over(wc))
        .withColumn("n", sum("c").over(Window.partitionBy("lang")))
        .groupBy("lang")
        .agg(max("n").as("n_docs"),
          // value v covers rank r iff cum-c < r <= cum; exactly one v per lang
          max(when(col("cum") - col("c") < expr("(n + 1) div 2") &&
            expr("(n + 1) div 2") <= col("cum"), col("tok"))).as("p50_tokens"),
          max(when(col("cum") - col("c") < expr("(9 * n + 9) div 10") &&
            expr("(9 * n + 9) div 10") <= col("cum"), col("tok"))).as("p90_tokens"))
        .orderBy("lang")
    }),
    // PII detection + redaction: email / phone / IPv4 regexes flag each
    // document and a chained regexp_replace scrubs them (the standard
    // pre-training scrub pass). Narrow per-doc — zero shuffles, streams
    // at 100 TB. The synthetic corpus carries no PII, so the query
    // plants deterministic PII in a derived column first (doc_id-keyed,
    // bit-identical on both engines) — the flags and the redaction then
    // exercise the real regexp paths, not a vacuous all-false scan. The
    // redacted text is emitted as (md5, length): hash-comparable without
    // shipping the full scrubbed corpus through the oracle.
    "q_pii_redact" -> ((s, d) => {
      val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
      val ipRe = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
      def redact(c: org.apache.spark.sql.Column) =
        regexp_replace(regexp_replace(regexp_replace(c,
          emailRe, "<EMAIL>"), phoneRe, "<PHONE>"), ipRe, "<IP>")
      Tables.documents(s, d)
        .withColumn("t2",
          when(col("doc_id") % 7 === 0,
            concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
              lit("@example.com or 555-867-"),
              lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
              lit(" ip 10.0."), (col("doc_id") % 256).cast("string"), lit(".7")))
            .otherwise(col("text")))
        // the redacted text is NAMED in its own projection (r19): both
        // consumers (md5 + length) referencing `redact(t2)` directly made
        // the plan evaluate the 3-regex replace chain TWICE per row
        // (CollapseProject keeps a multi-use non-cheap alias staged, so
        // the named column evaluates once — same trap as minhash's _sig)
        .withColumn("red", redact(col("t2")))
        .select(col("doc_id"),
          when(col("t2").rlike(emailRe), 1L).otherwise(0L).as("has_email"),
          when(col("t2").rlike(phoneRe), 1L).otherwise(0L).as("has_phone"),
          when(col("t2").rlike(ipRe), 1L).otherwise(0L).as("has_ip"),
          md5(col("red")).as("redacted_fp"),
          length(col("red")).cast("long").as("redacted_len"))
        .orderBy("doc_id")
    })
  )

  private val toksT = toksSql("text")

  def oracles: Map[String, String] = Map(
    "q_asof_join" ->
      s"""SELECT p.user_id, p.event_id, p.ts_ms,
                 coalesce(s.signup_ts_ms, -1) AS signup_ts_ms,
                 coalesce(s.signup_event_id, -1) AS signup_event_id
          FROM (SELECT user_id, event_id, ts_ms FROM $EventsSql WHERE event_type = 'purchase') p
          ASOF LEFT JOIN (SELECT user_id, ts_ms AS signup_ts_ms, max(event_id) AS signup_event_id
                          FROM $EventsSql WHERE event_type = 'signup' GROUP BY user_id, ts_ms) s
            ON p.user_id = s.user_id AND p.ts_ms >= s.signup_ts_ms
          ORDER BY p.user_id, p.ts_ms, p.event_id""",
    "q_asof_forward" ->
      s"""SELECT user_id, event_id, ts_ms,
                 coalesce(CASE WHEN m_ts - ts_ms <= $AsOfToleranceMs THEN m_ts END, -1) AS signup_ts_ms,
                 coalesce(CASE WHEN m_ts - ts_ms <= $AsOfToleranceMs THEN m_id END, -1) AS signup_event_id
          FROM (
            SELECT p.user_id, p.event_id, p.ts_ms, s.signup_ts_ms AS m_ts, s.signup_event_id AS m_id
            FROM (SELECT user_id, event_id, ts_ms FROM $EventsSql WHERE event_type = 'purchase') p
            ASOF LEFT JOIN (SELECT user_id, ts_ms AS signup_ts_ms, max(event_id) AS signup_event_id
                            FROM $EventsSql WHERE event_type = 'signup' GROUP BY user_id, ts_ms) s
              ON p.user_id = s.user_id AND p.ts_ms <= s.signup_ts_ms)
          ORDER BY user_id, ts_ms, event_id""",
    "q_interval_join" ->
      s"""WITH iv AS (
            SELECT min(ts_ms) AS start_ms, max(ts_ms) + $IncidentPadMs AS end_ms
            FROM (SELECT ts_ms, CAST(sum(CASE WHEN gap > $SplitGapMs THEN 1 ELSE 0 END)
                           OVER (ORDER BY ts_ms) AS BIGINT) AS bucket
                  FROM (SELECT ts_ms, ts_ms - lag(ts_ms) OVER (ORDER BY ts_ms) AS gap
                        FROM $EventsSql WHERE event_type = 'error'))
            GROUP BY bucket)
          SELECT iv.start_ms, iv.end_ms, CAST(count(*) AS BIGINT) AS n_events,
                 CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users,
                 CAST(sum(CAST(floor(e.value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_sum_e2
          FROM iv JOIN $EventsSql e
            ON e.event_type <> 'error' AND e.ts_ms >= iv.start_ms AND e.ts_ms <= iv.end_ms
          GROUP BY iv.start_ms, iv.end_ms ORDER BY iv.start_ms""",
    "q_repetition" ->
      s"""SELECT doc_id, n_shingles, n_distinct_shingles, n_tokens, n_distinct_tokens,
                 CASE WHEN n_shingles > 0
                      THEN CAST(floor((1.0 - n_distinct_shingles * 1.0 / n_shingles) * 10000 + 0.5) AS BIGINT)
                      ELSE 0 END AS dup_shingle_frac_e4
          FROM (SELECT doc_id,
                       CAST(len(sh) AS BIGINT) AS n_shingles,
                       CAST(len(list_distinct(sh)) AS BIGINT) AS n_distinct_shingles,
                       CAST(len(tk) AS BIGINT) AS n_tokens,
                       CAST(len(list_distinct(tk)) AS BIGINT) AS n_distinct_tokens
                FROM (SELECT doc_id, ${shinglesSql("tk")} AS sh, tk
                      FROM (SELECT doc_id, $toksT AS tk FROM documents)))
          ORDER BY doc_id""",
    "q_sample_split" ->
      s"""SELECT split, lang, CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(tok) AS BIGINT) AS n_tokens
          FROM (SELECT lang, CAST(len($toksT) AS BIGINT) AS tok,
                       CASE WHEN ${md5LongSql("CAST(doc_id AS VARCHAR)", 8)} % 100 < $SampleTrainPct THEN 'train'
                            WHEN ${md5LongSql("CAST(doc_id AS VARCHAR)", 8)} % 100 < $SampleValPct THEN 'val'
                            ELSE 'test' END AS split
                FROM documents)
          GROUP BY split, lang ORDER BY split, lang""",
    "q_shard_pack" ->
      s"""SELECT bucket, (cum - tok) // $ShardTokenBudget AS shard,
                 CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(tok) AS BIGINT) AS n_tokens,
                 min(doc_id) AS first_doc, max(doc_id) AS last_doc
          FROM (SELECT doc_id, tok, bucket,
                       CAST(sum(tok) OVER (PARTITION BY bucket ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
                FROM (SELECT doc_id, CAST(len($toksT) AS BIGINT) AS tok,
                             ${md5LongSql("CAST(doc_id AS VARCHAR)", 8)} % $ShardBuckets AS bucket
                      FROM documents))
          GROUP BY bucket, shard ORDER BY bucket, shard""",
    "q_decontaminate" ->
      s"""WITH sh AS (SELECT doc_id, unnest(list_distinct(${shinglesSql("tk")})) AS sh
                      FROM (SELECT doc_id, $toksT AS tk FROM documents)),
            ev AS (SELECT DISTINCT sh FROM sh WHERE doc_id < $EvalDocIds),
            tr AS (SELECT doc_id, sh FROM sh WHERE doc_id >= $EvalDocIds),
            ov AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_overlap
                   FROM tr WHERE sh IN (SELECT sh FROM ev) GROUP BY doc_id)
          SELECT t.doc_id, t.n_shingles, coalesce(ov.n_overlap, 0) AS n_overlap,
                 ${e4Sql("coalesce(ov.n_overlap, 0) * 1.0 / t.n_shingles")} AS contam_e4,
                 ${e4Sql("coalesce(ov.n_overlap, 0) * 1.0 / t.n_shingles")} > $ContamThresholdE4 AS flagged
          FROM (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles
                FROM tr GROUP BY doc_id) t
          LEFT JOIN ov ON t.doc_id = ov.doc_id
          ORDER BY t.doc_id""",
    "q_curation_filter" ->
      s"""SELECT reason, CAST(count(*) AS BIGINT) AS n_docs FROM (
            SELECT CASE WHEN n_tok < 5 THEN 'too_short'
                        WHEN n_tok > 1000 THEN 'too_long'
                        WHEN n_sh > 0 AND (1.0 - n_dsh * 1.0 / n_sh) > 0.6 THEN 'repetitive'
                        WHEN n_stop * 1.0 / n_tok < $EnRatioThreshold THEN 'low_stopword'
                        ELSE 'kept' END AS reason
            FROM (SELECT CAST(len(tk) AS BIGINT) AS n_tok,
                         CAST(len(list_filter(tk, x -> x IN (${Stopwords.map(w => s"'$w'").mkString(", ")}))) AS BIGINT) AS n_stop,
                         CAST(len(sh) AS BIGINT) AS n_sh,
                         CAST(len(list_distinct(sh)) AS BIGINT) AS n_dsh
                  FROM (SELECT tk, ${shinglesSql("tk")} AS sh
                        FROM (SELECT $toksT AS tk FROM documents))))
          GROUP BY reason ORDER BY reason""",
    "q_mix_sample" ->
      s"""WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
          q AS (SELECT source,
                       least(n_docs, CAST(ceil(sqrt(n_docs) * $MixTempC) AS BIGINT)) AS quota
                FROM c),
          r AS (SELECT source, doc_id,
                       row_number() OVER (PARTITION BY source
                         ORDER BY ${md5LongSql("CAST(doc_id AS VARCHAR)", 8)}, doc_id) AS rn
                FROM documents)
          SELECT r.source, r.doc_id FROM r JOIN q USING (source)
          WHERE rn <= quota ORDER BY source, doc_id""",
    "q_stratified" ->
      s"""SELECT lang, doc_id FROM (
            SELECT lang, doc_id,
                   row_number() OVER (PARTITION BY lang
                     ORDER BY ${md5LongSql("CAST(doc_id AS VARCHAR)", 8)}, doc_id) AS rn
            FROM documents)
          WHERE rn <= $StratumK ORDER BY lang, doc_id""",
    "q_quantiles" ->
      s"""SELECT lang, CAST(max(n) AS BIGINT) AS n_docs,
                 max(CASE WHEN rn = (n + 1) // 2 THEN tok END) AS p50_tokens,
                 max(CASE WHEN rn = (9 * n + 9) // 10 THEN tok END) AS p90_tokens
          FROM (SELECT lang, tok,
                       CAST(row_number() OVER (PARTITION BY lang ORDER BY tok, doc_id) AS BIGINT) AS rn,
                       CAST(count(*) OVER (PARTITION BY lang) AS BIGINT) AS n
                FROM (SELECT lang, doc_id, CAST(len($toksT) AS BIGINT) AS tok FROM documents))
          GROUP BY lang ORDER BY lang""",
    "q_pii_redact" ->
      s"""SELECT doc_id,
                 CAST(CASE WHEN regexp_matches(t2, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}') THEN 1 ELSE 0 END AS BIGINT) AS has_email,
                 CAST(CASE WHEN regexp_matches(t2, '[0-9]{3}-[0-9]{3}-[0-9]{4}') THEN 1 ELSE 0 END AS BIGINT) AS has_phone,
                 CAST(CASE WHEN regexp_matches(t2, '([0-9]{1,3}\\.){3}[0-9]{1,3}') THEN 1 ELSE 0 END AS BIGINT) AS has_ip,
                 md5(regexp_replace(regexp_replace(regexp_replace(t2,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                   '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'),
                   '([0-9]{1,3}\\.){3}[0-9]{1,3}', '<IP>', 'g')) AS redacted_fp,
                 CAST(length(regexp_replace(regexp_replace(regexp_replace(t2,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                   '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'),
                   '([0-9]{1,3}\\.){3}[0-9]{1,3}', '<IP>', 'g')) AS BIGINT) AS redacted_len
          FROM (SELECT doc_id,
                       CASE WHEN doc_id % 7 = 0
                            THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                                 || '@example.com or 555-867-'
                                 || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                                 || ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'
                            ELSE text END AS t2
                FROM documents)
          ORDER BY doc_id"""
  )
}
