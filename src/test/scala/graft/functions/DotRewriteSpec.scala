package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The HOF->native optimizer rewrite needs a session built WITH
  * GraftExtensions (separate from the shared fixture session). */
class DotRewriteSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    // getOrCreate returns any existing default session and silently
    // IGNORES withExtensions — clear the defaults first so this suite
    // gets a genuinely new session (sharing the JVM's SparkContext)
    // regardless of which suite ran before it.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-rewrite-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def hofDot = aggregate(
    zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  test("optimizer rewrites aggregate(zip_with(*)) to graft_dot") {
    // non-literal inputs, else constant folding collapses the whole
    // plan to a LocalRelation before anything is observable
    val df = spark.range(1, 4)
      .select(col("id"),
        transform(sequence(lit(1L), lit(4L)), i => (i * col("id")).cast("double")).as("a"),
        transform(sequence(lit(1L), lit(4L)), i => (i + col("id")).cast("double")).as("b"))
      .select(col("id"), hofDot.as("d"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_dot"), s"no rewrite in:\n$optimized")
    // id=1: a=[1,2,3,4], b=[2,3,4,5] -> 2+6+12+20 = 40
    assert(df.orderBy("id").collect()(0).getDouble(1) == 40.0)
  }

  test("rewrite preserves results vs a session without the rule") {
    import spark.implicits._
    val data = Seq(
      (Array(0.5, -1.25, 3.75, 0.0), Array(2.0, 4.0, -0.5, 9.9)),
      (Array(1e-8, 1e8, -1.0, 2.0), Array(7.0, 1e-8, 2.0, -3.0)))
    val df = data.toDF("a", "b").select(hofDot.as("d"))
    val expected = data.map { case (a, b) =>
      a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x * y } }
    assert(df.collect().map(_.getDouble(0)).toSeq == expected)
  }

  test("non-matching HOF aggregates are left alone") {
    import spark.implicits._
    // sum of squares of ONE array (not a zip_with multiply of two)
    val df = Seq(Tuple1(Array(2.0, 3.0))).toDF("a")
      .select(aggregate(col("a"), lit(0.0), (acc, x) => acc + x * x).as("s"))
    assert(!df.queryExecution.optimizedPlan.toString.contains("graft_dot"))
    assert(df.collect()(0).getDouble(0) == 13.0)
  }

  test("function registry form works via spark.sql") {
    spark.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect()(0).getDouble(0) == 11.0
  }
}
