package graft.operators

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Co-located bucketed joins — the 100 TB pattern for repeated joins on
  * the same key: both tables bucketed+sorted by the key at write time,
  * so the join's executed plan has ZERO Exchange operators (no shuffle
  * of either side, ever). This is the design the library prescribes for
  * a curated-corpus star schema (documents × doc-level signals joined
  * per pipeline stage); pinned here so the claim stays true. */
class BucketedJoinSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  test("bucketed+sorted tables join with zero exchanges") {
    val sp = spark
    import sp.implicits._
    // runtime conf, not builder conf: the JVM-wide test session is shared
    // across suites, so builder-time settings may never apply here
    val prevThreshold = sp.conf.get("spark.sql.autoBroadcastJoinThreshold")
    sp.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force a real join
    try {
      // a previously-crashed run can leave the managed location behind with
      // no catalog entry — DROP TABLE alone won't clear it
      for (t <- Seq("b_docs", "b_scores")) {
        sp.sql(s"DROP TABLE IF EXISTS $t")
        val loc = new java.io.File(
          sp.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
        if (loc.exists()) {
          loc.listFiles().foreach(_.delete()); loc.delete()
        }
      }
      val docs = (0L until 1000L).map(i => (i, s"text-$i")).toDF("doc_id", "text")
      val scores = (0L until 1000L).map(i => (i, i * 2)).toDF("doc_id", "score")
      docs.write.bucketBy(8, "doc_id").sortBy("doc_id")
        .mode("overwrite").saveAsTable("b_docs")
      scores.write.bucketBy(8, "doc_id").sortBy("doc_id")
        .mode("overwrite").saveAsTable("b_scores")

      val joined = sp.table("b_docs").join(sp.table("b_scores"), "doc_id")
      assert(joined.count() == 1000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a non-broadcast join over bucketed scans:\n$plan")
    } finally {
      sp.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      sp.sql("DROP TABLE IF EXISTS b_docs")
      sp.sql("DROP TABLE IF EXISTS b_scores")
    }
  }
}
