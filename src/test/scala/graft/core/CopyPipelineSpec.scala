package graft.core

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

class QualifiedNameSpec extends AnyFunSuite {
  test("schema.table parses") {
    assert(QualifiedName.parse("public.users") == QualifiedName("public", "users"))
    assert(QualifiedName.parse("public.users").fullName == "public.users")
  }
  test("bare table defaults to public") {
    assert(QualifiedName.parse("users") == QualifiedName("public", "users"))
  }
  test("too many dots rejected") {
    intercept[IllegalArgumentException](QualifiedName.parse("a.b.c"))
  }
}

class GlobSpec extends AnyFunSuite {
  import CopyPipeline.globToRegex
  test("star matches any name") {
    assert(globToRegex("*").matches("lineitem"))
  }
  test("prefix glob") {
    val re = globToRegex("line*")
    assert(re.matches("lineitem"))
    assert(!re.matches("orders"))
  }
  test("question mark matches one char") {
    val re = globToRegex("na?ion")
    assert(re.matches("nation"))
    assert(!re.matches("naation"))
  }
  test("literal dots are escaped") {
    val re = globToRegex("a.b")
    assert(re.matches("a.b"))
    assert(!re.matches("axb"))
  }
}

class CopyPipelineSpec extends AnyFunSuite with SparkFixture {
  private def tmp() = Files.createTempDirectory("graft_cp_test_").toString

  private def writeTable(dir: String, name: String): Unit = {
    import spark.implicits._
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
      .write.parquet(s"$dir/$name.parquet")
  }

  test("copyTable copies all rows and verifies the published copy") {
    val (src, dst) = (tmp(), tmp())
    writeTable(src, "t1")
    val res = CopyPipeline.copyTable(spark, new ParquetDir(src), new ParquetDir(dst), "t1")
    assert(res.rows == 3 && res.columns == 2)
    assert(new ParquetDir(dst).read(spark, "t1").count() == 3)
  }

  test("copyTable row count rides the write job; verifyCount recount agrees") {
    val (src, dst) = (tmp(), tmp())
    writeTable(src, "t1")
    // verifyCount = true: the observed write-side count must survive the
    // independent sink-side recount (require inside copyTable throws on
    // disagreement)
    val res = CopyPipeline.copyTable(spark, new ParquetDir(src), new ParquetDir(dst), "t1",
      options = CopyPipeline.CopyOptions(verifyCount = true))
    assert(res.rows == 3)
    assert(new ParquetDir(dst).read(spark, "t1").count() == res.rows)
  }

  test("copyTable projection + filter narrows the copy") {
    import org.apache.spark.sql.functions.col
    val (src, dst) = (tmp(), tmp())
    writeTable(src, "t1")
    val res = CopyPipeline.copyTable(spark, new ParquetDir(src), new ParquetDir(dst), "t1",
      options = CopyPipeline.CopyOptions(
        columns = Some(Seq("id")), filter = Some(col("id") > 1)))
    assert(res.rows == 2 && res.columns == 1)
  }

  test("publish is hotswap: second copy replaces, readers see full table") {
    val (src, dst) = (tmp(), tmp())
    writeTable(src, "t1")
    val sink = new ParquetDir(dst)
    CopyPipeline.copyTable(spark, new ParquetDir(src), sink, "t1")
    CopyPipeline.copyTable(spark, new ParquetDir(src), sink, "t1") // overwrite
    assert(sink.read(spark, "t1").count() == 3)
    // no staging leftovers
    val leftovers = new java.io.File(dst).list().count(_.startsWith(".staging"))
    assert(leftovers == 0)
  }

  test("copyTables glob fans out over matching SOURCE tables") {
    val (src, dst) = (tmp(), tmp())
    writeTable(src, "na_one"); writeTable(src, "na_two"); writeTable(src, "other")
    val results = CopyPipeline.copyTables(spark, new ParquetDir(src), new ParquetDir(dst), "na_*")
    assert(results.map(_.table).sorted == Seq("na_one", "na_two"))
    assert(!new ParquetDir(dst).tableExists("other"))
  }

  test("failures propagate (missing source table)") {
    val (src, dst) = (tmp(), tmp())
    intercept[Exception] {
      CopyPipeline.copyTable(spark, new ParquetDir(src), new ParquetDir(dst), "nope")
    }
  }

  test("catalog: list/exists/schema") {
    val src = tmp()
    writeTable(src, "t1")
    val pd = new ParquetDir(src)
    assert(pd.listTables() == Seq("t1"))
    assert(pd.tableExists("t1") && !pd.tableExists("t2"))
    val cols = pd.schemaOf(spark, "t1")
    assert(cols.map(_.name) == Seq("id", "v"))
    assert(cols.map(_.pgType) == Seq("bigint", "text"))
  }

  test("namespaces: public always listed; create is idempotent; staging dirs excluded") {
    val src = tmp()
    writeTable(src, "t1")
    val pd = new ParquetDir(src)
    assert(pd.listNamespaces() == Seq("public"))
    pd.createNamespace("analytics")
    pd.createNamespace("analytics") // idempotent (CREATE SCHEMA IF NOT EXISTS)
    assert(pd.namespaceExists("analytics"))
    // empty dir is not yet a namespace with tables; write one in
    writeTable(s"$src/analytics", "t2")
    assert(pd.listNamespaces() == Seq("analytics", "public"))
    // dot-dirs (staging) never surface
    new java.io.File(src, ".staging_x").mkdirs()
    assert(pd.listNamespaces() == Seq("analytics", "public"))
  }

  test("ifNotExists skips an existing destination instead of hotswapping") {
    val (src, dst) = (tmp(), tmp())
    writeTable(src, "t1")
    val sink = new ParquetDir(dst)
    val first = CopyPipeline.copyTable(spark, new ParquetDir(src), sink, "t1",
      options = CopyPipeline.CopyOptions(ifNotExists = true))
    assert(!first.skipped && first.rows == 3)
    // shrink the source; a skip-mode copy must NOT propagate the change
    import org.apache.spark.sql.functions.col
    val second = CopyPipeline.copyTable(spark, new ParquetDir(src), sink, "t1",
      options = CopyPipeline.CopyOptions(filter = Some(col("id") > 2), ifNotExists = true))
    assert(second.skipped && second.rows == 3)
    assert(sink.read(spark, "t1").count() == 3)
  }

  test("cli: glob copy + skip-if-exists flags") {
    val (src, dst) = (tmp(), tmp())
    writeTable(src, "cli_a"); writeTable(src, "cli_b"); writeTable(src, "other")
    val results = graft.tools.Cli.run(spark, Array("cp", src, dst, "cli_*"))
    assert(results.map(_.table).sorted == Seq("cli_a", "cli_b"))
    val again = graft.tools.Cli.run(spark,
      Array("cp", src, dst, "cli_a", "--if-not-exists"))
    assert(again.head.skipped)
    val projected = graft.tools.Cli.run(spark,
      Array("cp", src, dst, "other", "--columns", "id"))
    assert(projected.head.columns == 1)
    intercept[IllegalArgumentException](graft.tools.Cli.run(spark, Array("nope")))
  }

  test("copyIncremental appends only rows past the destination watermark, then 0") {
    import org.apache.spark.sql.functions.col
    val (src, dst) = (tmp(), tmp())
    writeTable(src, "t1") // ids 1, 2, 3
    val sink = new ParquetDir(dst)
    CopyPipeline.copyTable(spark, new ParquetDir(src), sink, "t1",
      options = CopyPipeline.CopyOptions(filter = Some(col("id") <= 2)))
    assert(sink.read(spark, "t1").count() == 2)
    val appended = CopyPipeline.copyIncremental(spark, new ParquetDir(src), sink, "t1", "id")
    assert(appended == 1 && sink.read(spark, "t1").count() == 3)
    // idempotent: nothing past the watermark now
    val again = CopyPipeline.copyIncremental(spark, new ParquetDir(src), sink, "t1", "id")
    assert(again == 0 && sink.read(spark, "t1").count() == 3)
  }

  test("cli: --force-schema targets a destination namespace (reference -f)") {
    val (src, dst) = (tmp(), tmp())
    writeTable(src, "fs_a"); writeTable(src, "fs_b")
    val results = graft.tools.Cli.run(spark,
      Array("cp", src, dst, "fs_*", "--force-schema", "analytics"))
    assert(results.map(_.table).sorted == Seq("analytics/fs_a", "analytics/fs_b"))
    val pd = new ParquetDir(dst)
    assert(pd.listNamespaces().contains("analytics"))
    assert(pd.tableExists("analytics/fs_a") && !pd.tableExists("fs_a"))
    assert(pd.read(spark, "analytics/fs_a").count() == 3)
  }

  test("cli pipeline: one-pass curation DAG — staged artifacts equal the per-query composition") {
    val sf = "/root/testdata/sf0.001"
    val out = tmp()
    val stages = graft.tools.Cli.pipeline(spark, Array("pipeline", sf, out))
    assert(stages.map(_._1) ==
      Seq("dup_classes", "keep_best", "manifest_publish", "snapshot_commit"),
      s"four stages in dependency order, got $stages")
    assert(stages.forall(_._2 > 0), s"every stage must produce rows: $stages")
    // stage artifacts are the real deliverables
    for (a <- Seq("dup_classes.parquet", "keep_best.parquet", "training_cut"))
      assert(new java.io.File(s"$out/$a").exists(), s"missing artifact $a")
    assert(new java.io.File(s"$out/training_cut/split=train").exists(),
      "published manifest must be hive-partitioned by split")
    // the one-pass keep-best equals the per-query composition bit for bit
    val staged = spark.read.parquet(s"$out/keep_best.parquet")
      .orderBy("doc_id").collect().toSeq
    val direct = graft.ops.Text.dedupKeepBest(spark, sf)
      .collect().toSeq
    assert(staged == direct, "staged keep_best diverged from dedupKeepBest")
    // and the published manifest equals the declared capstone's manifest
    val published = spark.read.parquet(s"$out/training_cut")
      .select("doc_id", "lang", "split", "in_cut")
      .orderBy("doc_id").collect().toSeq
    val capstone = graft.ops.Text.trainingCut(spark, sf)
      .select("doc_id", "lang", "split", "in_cut")
      .collect().toSeq
    assert(published == capstone, "published manifest diverged from trainingCut")
    // the snapshot-log commit is the same content, versioned: a second
    // pipeline run must land as version 2 with an identical-content head
    val table = s"$out/training_cut_log"
    assert(graft.core.SnapshotLog.versions(table) == Seq(1L))
    val logged = graft.core.SnapshotLog.read(spark, table)
      .select("doc_id", "lang", "split", "in_cut")
      .orderBy("doc_id").collect().toSeq
    assert(logged == capstone, "snapshot-log head diverged from the published manifest")
    graft.tools.Cli.pipeline(spark, Array("pipeline", sf, out))
    assert(graft.core.SnapshotLog.versions(table) == Seq(1L, 2L),
      "a re-run must commit a NEW version, not clobber v1")
  }

  test("cli optimize: compact + vacuum + orphan sweep as one maintenance command") {
    import spark.implicits._
    val t = java.nio.file.Files.createTempDirectory("graft_cliopt_").toString
    (0 until 5).foreach { i =>
      val rows = (0 until 40).map(j => ((40 * i + j).toLong, (40 * i + j).toDouble))
      graft.core.SnapshotLog.commit(spark, rows.toDF("id", "v").repartition(2),
        t, append = i > 0, statsFor = if (i == 0) Seq("v") else Seq.empty)
    }
    spark.range(1).write.parquet(s"$t/data/crashed-writer") // orphan litter
    val out = graft.tools.Cli.optimize(spark, Array("optimize", t,
      "--target-files", "4", "--cluster-by", "v",
      "--vacuum-keep", "1", "--vacuum-orphans")).toMap
    assert(out("compacted_version") == 6L)
    assert(out("vacuumed_files") > 0L, "pre-compaction files must be reclaimed")
    // the orphan is younger than the default grace period — protected
    assert(out("orphan_stages") == 0L)
    assert(graft.core.SnapshotLog.versions(t) == Seq(6L))
    assert(graft.core.SnapshotLog.read(spark, t).count() == 200L)
    // the clustered rewrite re-indexed v: range skipping works post-maintenance
    val (kept, skipped) = graft.core.SnapshotLog.prunedFiles(t, "v", 0.0, 30.0)
    assert(skipped.nonEmpty && kept.nonEmpty)
  }

  test("cli: --config resolves named locations; --log appends result lines") {
    val (src, dst) = (tmp(), tmp())
    writeTable(src, "cfg_t")
    val cfg = Files.createTempFile("graft_cfg_", ".properties")
    Files.writeString(cfg, s"prod=$src\nscratch=$dst\n")
    val log = Files.createTempFile("graft_log_", ".txt")
    val results = graft.tools.Cli.run(spark,
      Array("cp", "prod", "scratch", "cfg_t",
        "--config", cfg.toString, "--log", log.toString))
    assert(results.head.rows == 3)
    assert(new ParquetDir(dst).tableExists("cfg_t"))
    val logged = Files.readString(log)
    assert(logged.contains("copied cfg_t: 3 rows"), s"log file missing line: $logged")
  }
}
