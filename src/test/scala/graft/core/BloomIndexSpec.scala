package graft.core

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.core.SnapshotLog.Pred
import graft.sources.LogSourceAudit

/** Per-file BLOOM-FILTER indexes (Delta's bloom filter index): point
  * equality on a high-cardinality, NON-clustered column skips files
  * min/max bounds cannot — config via table properties, filters built
  * in the commit's single stats pass, sidecars per data file, probed
  * on the driver (small candidate sets) or per task on the executors
  * (unbounded ones). */
class BloomIndexSpec extends AnyFunSuite with SparkFixture {

  /** 8 files over ids [0,1000): each file holds ids ≡ f (mod 8), so
    * every file's [lo,hi] spans the whole key range — min/max bounds
    * keep ALL files and any skipping observed is the bloom tier's. */
  private def bloomTable(fpp: String = "0.001"): String = {
    import spark.implicits._
    val t = Files.createTempDirectory("graft_bloom_").toString
    val df = (0 until 1000).map(i => (i.toLong, f"k$i%04d", i % 8))
      .toDF("id", "key", "f")
      .repartitionByRange(8, col("f"))
      .drop("f")
    SnapshotLog.commit(spark, df, t, statsFor = Seq("id", "key"),
      props = Some(Map(
        BloomIndex.ColumnsProp -> "key,id",
        BloomIndex.FppProp -> fpp,
        BloomIndex.ItemsProp -> "1000")))
    t
  }

  private def opened[A](f: => A): (A, Long) = {
    val before = LogSourceAudit.filesOpened.get()
    val r = f
    (r, LogSourceAudit.filesOpened.get() - before)
  }

  /** Files the bloom tier would keep for `p` — the test's own ground
    * truth (deterministic: same hashes, same sidecars). */
  private def keptByBloom(t: String, p: Pred): Int = {
    val entries = SnapshotLog.resolve(t,
      SnapshotLog.latestVersion(t).get).entries
    entries.count(e => !BloomIndex.provablyEmpty(t, e, p))
  }

  test("commit stages one sidecar per file; bounds overlap everywhere, bloom prunes to the holding file") {
    val t = bloomTable()
    val entries = SnapshotLog.resolve(t, 1L).entries
    assert(entries.size == 8)
    assert(entries.forall(_.idx.isDefined), s"every file indexes: $entries")
    assert(entries.forall(e => Files.exists(Paths.get(t, e.idx.get))))
    // bounds alone keep everything (the layout interleaves keys)
    val (keptBounds, _) = SnapshotLog.prunedFilesWhere(t, Pred.StrEq("key", "k0123"))
    assert(keptBounds.size == 8, "min/max must NOT prune this layout")

    // string point lookup through the DSv2 relation (driver tier)
    val expectS = keptByBloom(t, Pred.StrEq("key", "k0123"))
    assert(expectS >= 1 && expectS <= 2, s"fpp=0.001 over 7 misses: $expectS")
    val (rows, n) = opened(spark.read.format("graft-log").load(t)
      .filter(col("key") === "k0123").select("id").collect())
    assert(rows.map(_.getLong(0)).toSeq == Seq(123L))
    assert(n == expectS.toLong, s"bloom must open $expectS files, opened $n")

    // numeric point lookup probes the double view the stats pass hashed
    val expectN = keptByBloom(t, Pred.Eq("id", 500.0))
    val (rows2, n2) = opened(spark.read.format("graft-log").load(t)
      .filter(col("id") === 500L).select("key").collect())
    assert(rows2.map(_.getString(0)).toSeq == Seq("k0500"))
    assert(n2 == expectN.toLong, s"bloom must open $expectN files, opened $n2")

    // an ABSENT key proves empty everywhere: zero files, zero rows
    val (rows3, n3) = opened(spark.read.format("graft-log").load(t)
      .filter(col("key") === "nope").collect())
    assert(rows3.isEmpty && n3 == keptByBloom(t, Pred.StrEq("key", "nope")).toLong)
    assert(n3 <= 1L, s"absent key should open ~0 files (fp allowance 1), opened $n3")
  }

  test("IN-lists prune to the union of holding files; library readWhere agrees") {
    val t = bloomTable()
    val p = Pred.StrIn("key", Seq("k0001", "k0777"))
    val expect = keptByBloom(t, p)
    val (got, n) = opened(spark.read.format("graft-log").load(t)
      .filter(col("key").isin("k0001", "k0777"))
      .select("id").collect().map(_.getLong(0)).toSet)
    assert(got == Set(1L, 777L))
    assert(n == expect.toLong, s"IN must open $expect, opened $n")

    // library path: readWhere prunes through the same sidecars
    val viaLib = SnapshotLog.readWhere(spark, t, p)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(viaLib == Set(1L, 777L))
    // an all-miss predicate returns the empty frame with full schema
    val empty = SnapshotLog.readWhere(spark, t, Pred.StrEq("key", "absent"))
    assert(empty.isEmpty && empty.columns.toSeq == Seq("id", "key"))
  }

  test("past graft.bloom.driverMaxFiles the probe moves to the executors (tasks skip before opening)") {
    val t = bloomTable()
    SnapshotLog.setProperties(t, Map(BloomIndex.DriverMaxProp -> "0"))
    val expect = keptByBloom(t, Pred.StrEq("key", "k0321"))
    val (rows, n) = opened(spark.read.format("graft-log").load(t)
      .filter(col("key") === "k0321").select("id").collect())
    assert(rows.map(_.getLong(0)).toSeq == Seq(321L))
    // all 8 partitions PLAN (the driver declined), but the bloom-missed
    // tasks never construct a parquet reader
    assert(n == expect.toLong,
      s"executor probe must open $expect of 8 planned files, opened $n")
  }

  test("past graft.bloom.driverMaxBytes the driver declines too — executors still skip") {
    val t = bloomTable()
    SnapshotLog.setProperties(t, Map(BloomIndex.DriverMaxBytesProp -> "0"))
    val expect = keptByBloom(t, Pred.StrEq("key", "k0042"))
    val (rows, n) = opened(spark.read.format("graft-log").load(t)
      .filter(col("key") === "k0042").select("id").collect())
    assert(rows.map(_.getLong(0)).toSeq == Seq(42L))
    assert(n == expect.toLong,
      s"byte-bounded driver defers to executor probe: expected $expect opens, got $n")
  }

  test("deletion vectors stay sound: a vectored key still probes true, reads, and yields no row") {
    val t = bloomTable()
    SnapshotLog.deleteWhere(spark, t, Pred.Eq("id", 500.0))
    // the filter still says "maybe" for the holding file (a DV cannot
    // introduce a false negative) — the read applies the vector
    val (gone, n1) = opened(spark.read.format("graft-log").load(t)
      .filter(col("key") === "k0500").collect())
    assert(gone.isEmpty && n1 >= 1L)
    val (still, _) = opened(spark.read.format("graft-log").load(t)
      .filter(col("key") === "k0501").select("id").collect())
    assert(still.map(_.getLong(0)).toSeq == Seq(501L))
  }

  test("appends inherit the head's bloom config; OPTIMIZE recomputes sidecars for the rewritten files") {
    import spark.implicits._
    val t = bloomTable()
    SnapshotLog.commit(spark,
      Seq((5000L, "x5000"), (5001L, "x5001")).toDF("id", "key"),
      t, append = true)
    val v2 = SnapshotLog.resolve(t, 2L).entries
    assert(v2.forall(_.idx.isDefined), "appended files must index too")
    val expect = keptByBloom(t, Pred.StrEq("key", "x5001"))
    val (got, n) = opened(spark.read.format("graft-log").load(t)
      .filter(col("key") === "x5001").select("id").collect())
    assert(got.map(_.getLong(0)).toSeq == Seq(5001L) && n == expect.toLong)

    val v3 = SnapshotLog.compact(spark, t, targetFiles = 3)
    val entries = SnapshotLog.resolve(t, v3).entries
    assert(entries.forall(_.idx.isDefined), "compaction must re-index")
    val (got2, n2) = opened(spark.read.format("graft-log").load(t)
      .filter(col("key") === "k0123").select("id").collect())
    assert(got2.map(_.getLong(0)).toSeq == Seq(123L))
    assert(n2 <= keptByBloom(t, Pred.StrEq("key", "k0123")).toLong)
  }

  test("RENAME COLUMN carries the index: the property follows, sidecar keys stay physical") {
    val t = bloomTable()
    SnapshotLog.renameColumn(spark, t, "key", "doc_key")
    val st = SnapshotLog.resolve(t, SnapshotLog.latestVersion(t).get)
    assert(st.props(BloomIndex.ColumnsProp) == "doc_key,id")
    val (rows, n) = opened(spark.read.format("graft-log").load(t)
      .filter(col("doc_key") === "k0123").select("id").collect())
    assert(rows.map(_.getLong(0)).toSeq == Seq(123L))
    assert(n <= 2L, s"renamed column must still bloom-prune, opened $n")
    // and a post-rename append indexes under the SAME physical name
    import spark.implicits._
    SnapshotLog.commit(spark,
      Seq((9000L, "z9000")).toDF("id", "doc_key"), t, append = true)
    val (rows2, n2) = opened(spark.read.format("graft-log").load(t)
      .filter(col("doc_key") === "z9000").select("id").collect())
    assert(rows2.map(_.getLong(0)).toSeq == Seq(9000L) && n2 <= 2L)
  }

  test("vacuum retires dead sidecars with their entries and keeps live ones") {
    val t = bloomTable()
    val v1Idx = SnapshotLog.resolve(t, 1L).entries.flatMap(_.idx)
    val head = SnapshotLog.compact(spark, t, targetFiles = 2)
    SnapshotLog.vacuum(t, keepFrom = head)
    v1Idx.foreach(i => assert(!Files.exists(Paths.get(t, i)),
      s"dead sidecar $i must be vacuumed"))
    val live = SnapshotLog.resolve(t, head).entries
    live.flatMap(_.idx).foreach(i =>
      assert(Files.exists(Paths.get(t, i)), s"live sidecar $i must survive"))
    val (rows, _) = opened(spark.read.format("graft-log").load(t)
      .filter(col("key") === "k0123").select("id").collect())
    assert(rows.map(_.getLong(0)).toSeq == Seq(123L))
  }

  test("a MISSING sidecar degrades to a read, never a skip (restore/copy robustness)") {
    val t = bloomTable()
    val entries = SnapshotLog.resolve(t, 1L).entries
    entries.flatMap(_.idx).foreach(i => Files.delete(Paths.get(t, i)))
    val (rows, n) = opened(spark.read.format("graft-log").load(t)
      .filter(col("key") === "k0123").select("id").collect())
    assert(rows.map(_.getLong(0)).toSeq == Seq(123L))
    assert(n == 8L, "no sidecars -> every bounds-kept file reads")
  }

  test("SQL surface: TBLPROPERTIES create/set/unset, SHOW TBLPROPERTIES, pruned point SELECT") {
    val root = Files.createTempDirectory("graft_bloomcat_").toString
    spark.conf.set("spark.sql.catalog.graftb",
      classOf[graft.sources.LogCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftb.root", root)
    org.apache.spark.sql.graft.Bridge.resetCatalogs(spark)
    spark.sql("CREATE NAMESPACE graftb.ml")
    spark.sql(
      """CREATE TABLE graftb.ml.bt (id BIGINT, key STRING)
        |TBLPROPERTIES ('graft.bloom.columns'='key',
        |               'graft.bloom.items'='1000')""".stripMargin)
    val props = spark.sql("SHOW TBLPROPERTIES graftb.ml.bt").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get(BloomIndex.ColumnsProp).contains("key"))
    import spark.implicits._
    (0 until 400).map(i => (i.toLong, f"s$i%04d")).toDF("id", "key")
      .repartitionByRange(4, col("id") % 4)
      .createOrReplaceTempView("bt_src")
    spark.sql("INSERT INTO graftb.ml.bt SELECT * FROM bt_src")
    val t = s"$root/ml/bt"
    assert(SnapshotLog.resolve(t, SnapshotLog.latestVersion(t).get)
      .entries.filter(_.rows > 0).forall(_.idx.isDefined))
    val (rows, n) = opened(
      spark.sql("SELECT id FROM graftb.ml.bt WHERE key = 's0123'").collect())
    assert(rows.map(_.getLong(0)).toSeq == Seq(123L))
    assert(n <= 2L, s"SQL point lookup must bloom-prune, opened $n")
    // SET adds a second indexed column; UNSET turns the index off for
    // future writes (existing sidecars still serve)
    spark.sql("ALTER TABLE graftb.ml.bt SET TBLPROPERTIES " +
      s"('${BloomIndex.ColumnsProp}'='key,id')")
    assert(SnapshotLog.properties(t)(BloomIndex.ColumnsProp) == "key,id")
    intercept[Exception] {
      spark.sql("ALTER TABLE graftb.ml.bt SET TBLPROPERTIES " +
        s"('${BloomIndex.ColumnsProp}'='key,nope')")
    }
    spark.sql("ALTER TABLE graftb.ml.bt UNSET TBLPROPERTIES " +
      s"('${BloomIndex.ColumnsProp}')")
    assert(!SnapshotLog.properties(t).contains(BloomIndex.ColumnsProp))
    spark.sql("DROP TABLE graftb.ml.bt")
  }

  test("property validation fails loudly: bad fpp, oversized filter") {
    val t = bloomTable()
    intercept[IllegalArgumentException] {
      SnapshotLog.setProperties(t, Map(BloomIndex.FppProp -> "1.5"))
    }
    intercept[IllegalArgumentException] {
      SnapshotLog.setProperties(t, Map(BloomIndex.ItemsProp -> "999999999"))
    }
    // the failed attempts committed nothing
    assert(SnapshotLog.properties(t)(BloomIndex.FppProp) == "0.001")
  }
}
