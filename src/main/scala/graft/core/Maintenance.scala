package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table-layout maintenance — the upkeep a 100 TB parquet estate needs
  * that the reference never faced (its tables lived in Postgres):
  * small-file compaction and multi-dimensional (Z-order) clustering. */
object Maintenance {

  /** Small-file compaction: rewrite a fragmented table into few large
    * files. At scale this is THE read-amplification fix — a 100 TB
    * table fragmented into millions of files spends more time opening
    * footers than scanning; compaction to ~1 GB files restores
    * metadata-bounded planning. Demonstrated here by fragmenting
    * `orders` into 16 files and compacting to 2; the report carries
    * observed file counts + row counts so the oracle can verify both
    * layout intent and zero row loss. */
  def compactFiles(spark: SparkSession, dir: String,
                   fragments: Int = 16, target: Int = 2): DataFrame = {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_compact_").toString
    val orders = Tables.orders(spark, dir)
    orders.repartition(fragments).write.mode("overwrite").parquet(s"$out/frag")
    val frag = spark.read.parquet(s"$out/frag")
    frag.repartition(target).write.mode("overwrite").parquet(s"$out/compact")
    def files(p: String): Long =
      Option(new java.io.File(p).list()).getOrElse(Array.empty[String])
        .count(f => f.endsWith(".parquet")).toLong
    val nAfter = spark.read.parquet(s"$out/compact").count()
    val report = Seq(
      ("after", files(s"$out/compact"), nAfter),
      ("before", files(s"$out/frag"), orders.count()))
      .toDF("phase", "n_files", "n_rows")
      .orderBy("phase")
    // all numbers above are already materialized driver-side values —
    // the scratch copies can go (repeated runs must not fill the disk)
    TempDirs.deleteRecursively(new java.io.File(out))
    report
  }

  /** Z-value: bit-interleave of two low-cardinality-bucketed columns
    * (10 bits each -> 20-bit value). Pure integer arithmetic, identical
    * in any engine. */
  def zValue(x: Column, y: Column, bits: Int = 10): Column =
    zValueN(Seq(x, y), bits)

  /** N-DIMENSIONAL z-value: round-robin bit-interleave of N bucketed
    * columns — output bit `b * N + i` is bit `b` of column `i`, the
    * same layout as the 2-dim form (x at even bits, y at odd).
    * `N * bits` must fit a long. Rows close in EVERY dimension share
    * long z-prefixes, so range-partitioning by this key gives each
    * file a tight N-dim bounding box — the multi-dimensional
    * data-skipping layout for tables queried on 3-4 dims at once. */
  def zValueN(cs: Seq[Column], bits: Int = 10): Column = {
    require(cs.size >= 2 && cs.size * bits <= 62,
      s"zValueN needs 2..${62 / bits} columns at $bits bits, got ${cs.size}")
    (0 until bits).flatMap { b =>
      cs.zipWithIndex.map { case (c, i) =>
        shiftleft(shiftright(c, b).bitwiseAND(1), b * cs.size + i)
      }
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Z-order clustering key over orders (customer bucket x day bucket):
    * sorting/range-partitioning by this key co-locates rows close in
    * BOTH dimensions, so parquet min/max row-group stats prune scans
    * filtered on either column — the standard multi-dim data-skipping
    * layout (`repartitionByRange(zval).sortWithinPartitions(zval)
    * .write` at production scale; here the deterministic key + global
    * order is what the oracle verifies). */
  def zorderKey(spark: SparkSession, dir: String, limit: Int = 200): DataFrame = {
    val x = pmod(col("o_custkey"), lit(1024L))
    val y = pmod(datediff(col("o_orderdate").cast("date"),
      lit("1992-01-01").cast("date")).cast("bigint"), lit(1024L))
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), zValue(x, y).as("zval"))
      .orderBy(col("zval").asc, col("o_orderkey").asc)
      .limit(limit)
  }
}
