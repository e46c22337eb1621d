package graft.tools
import org.apache.spark.sql.SparkSession

/** Ad-hoc timing harness used during development (not part of the
  * driver contract). Args: <sfDir> <queryName>... */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[4]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SCRATCH_PARTS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SCRATCH_AQE", "true"))
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh_").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args(0)
    val explain = sys.env.get("SCRATCH_EXPLAIN").contains("1")
    args.drop(1).foreach { name =>
      if (explain) {
        println(s"========== $name ==========")
        graft.SparkEntry.queries(name)(spark, dir).explain("formatted")
      } else {
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries(name)(spark, dir).count()
        println(f"[scratch] $name rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
