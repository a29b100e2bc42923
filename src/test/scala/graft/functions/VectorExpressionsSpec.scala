package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[VectorDot]] pins: bit-identical to the HOF composition it replaced
  * (same ordered summation), float/double element handling, codegen path
  * exercised, SQL registration. */
class VectorExpressionsSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  test("bit-identical to aggregate(zip_with(...)) over random double arrays") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map(_ =>
      ((0 until 16).map(_ => rnd.nextDouble()).toArray,
        (0 until 16).map(_ => rnd.nextDouble()).toArray))
    val df = rows.toDF("a", "b")
    val hof = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val both = df.select(
      VectorExpressions.vector_dot(col("a"), col("b")).as("nat"), hof.as("ref"))
      .collect()
    both.foreach(r => assert(
      java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
      s"${r.getDouble(0)} != ${r.getDouble(1)}"))
  }

  test("corner semantics match the HOF form: unequal lengths and null elements → null") {
    val sp = spark
    import sp.implicits._
    val df = Seq((Array(1.0, 2.0), Array(1.0, 2.0, 3.0)))
      .toDF("a", "b")
      .select(VectorExpressions.vector_dot(col("a"), col("b")).as("d"))
    assert(df.head().isNullAt(0), "unequal lengths must yield null, as zip_with+fold does")
    val withNullElem = spark.sql(
      "SELECT array(1.0D, CAST(NULL AS DOUBLE)) AS a, array(1.0D, 2.0D) AS b")
    assert(withNullElem.select(
      VectorExpressions.vector_dot(col("a"), col("b"))).head().isNullAt(0))
  }

  test("optimizer rule rewrites the HOF dot idiom into vector_dot") {
    val sp = spark
    import sp.implicits._
    sp.experimental.extraOptimizations = Seq(graft.plans.RewriteHofDotProduct)
    try {
      // a non-local source, or ConvertToLocalRelation folds the whole
      // projection into literal rows before the plan can be inspected
      val df = sp.range(1, 3)
        .selectExpr("array(CAST(id AS DOUBLE), 2.0D) AS a", "array(3.0D, 4.0D) AS b")
        .select(aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
          lit(0.0), (acc, x) => acc + x).as("d"))
      assert(df.queryExecution.optimizedPlan.toString.contains("vector_dot"),
        s"HOF idiom not rewritten:\n${df.queryExecution.optimizedPlan}")
      assert(df.orderBy("d").collect().map(_.getDouble(0)).toSeq == Seq(11.0, 14.0))
    } finally sp.experimental.extraOptimizations = Nil
  }

  test("float arrays promote per element, exactly as cast-then-multiply") {
    val sp = spark
    import sp.implicits._
    val df = Seq((Array(1.5f, 2.25f, -3.0f), Array(0.5, 2.0, 1.0)))
      .toDF("f", "d")
    val got = df.select(VectorExpressions.vector_dot(col("f"), col("d")))
      .head().getDouble(0)
    assert(got == 1.5 * 0.5 + 2.25 * 2.0 + (-3.0) * 1.0)
  }

  test("registered SQL function evaluates inside whole-stage codegen") {
    graft.GraftExtensions.register(spark)
    // literal arrays constant-fold at plan time (itself proof eval works);
    // use a real column so the projection must execute
    spark.range(3).selectExpr("array(cast(id AS double), 2.0D) AS a")
      .createOrReplaceTempView("vecs")
    val df = spark.sql("SELECT vector_dot(a, array(3.0D, 4.0D)) AS d FROM vecs")
    assert(df.orderBy("d").collect().map(_.getDouble(0)).toSeq == Seq(8.0, 11.0, 14.0))
    // the project with vector_dot must sit inside a codegen stage (the
    // `*(n)` prefix), not fall back to an interpreted Project
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("vector_dot"),
      s"vector_dot project not codegen'd:\n$plan")
  }

  test("pack_doubles/unpack_doubles round-trip every bit pattern — " +
    "random, special (NaN/inf/±0/subnormal) and float-promoted — in " +
    "BOTH codegen and interpreted paths") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(13)
    val special = Array(Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity, 0.0, -0.0, Double.MinPositiveValue,
      Double.MaxValue, Double.MinValue)
    val rows = (0 until 50).map(_ =>
      Tuple1((0 until 8).map(_ => rnd.nextDouble()).toArray)) :+
      Tuple1(special)
    // non-local source → the projection executes in a codegen stage
    val df = rows.toDF("a").repartition(2)
    val rt = df.select(col("a"),
      VectorExpressions.unpack_doubles(
        VectorExpressions.pack_doubles(col("a"))).as("b"))
    def bitsEqual(r: org.apache.spark.sql.Row): Unit = {
      val a = r.getSeq[Double](0)
      val b = r.getSeq[Double](1)
      assert(a.size == b.size)
      a.zip(b).foreach { case (x, y) =>
        assert(java.lang.Double.doubleToLongBits(x) ==
          java.lang.Double.doubleToLongBits(y), s"$x != $y (bitwise)")
      }
    }
    rt.collect().foreach(bitsEqual)
    // interpreted path (codegen off) must agree bit-for-bit
    sp.conf.set("spark.sql.codegen.wholeStage", "false")
    sp.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try rt.collect().foreach(bitsEqual)
    finally {
      sp.conf.set("spark.sql.codegen.wholeStage", "true")
      sp.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    // float arrays promote per element before packing
    val f = Seq(Tuple1(Array(1.5f, -2.25f))).toDF("f").repartition(1)
      .select(VectorExpressions.unpack_doubles(
        VectorExpressions.pack_doubles(col("f"))).as("d"))
      .head().getSeq[Double](0)
    assert(f == Seq(1.5, -2.25))
  }

  test("unpack_doubles refuses truncated bytes loudly; pack_doubles " +
    "refuses null elements — a corrupt cell must never decode short") {
    val sp = spark
    import sp.implicits._
    val bad = Seq(Tuple1(Array[Byte](1, 2, 3))).toDF("b").repartition(1)
      .select(VectorExpressions.unpack_doubles(col("b")))
    val e = intercept[Exception](bad.collect())
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(e).exists(_.contains("not a whole number")), chain(e))
    val withNull = sp.sql("SELECT array(1.0D, CAST(NULL AS DOUBLE)) AS a")
      .repartition(1).select(VectorExpressions.pack_doubles(col("a")))
    val e2 = intercept[Exception](withNull.collect())
    assert(chain(e2).exists(_.contains("null element")), chain(e2))
  }
}
