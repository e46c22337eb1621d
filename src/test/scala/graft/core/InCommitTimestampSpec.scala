package graft.core

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.nio.file.attribute.FileTime

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** IN-COMMIT TIMESTAMPS (Delta's inCommitTimestamps): the commit
  * instant is DATA in the record, monotonic across writers — so
  * timestamp time travel survives the table directory being copied,
  * backed up, or restored (file mtimes do not). */
class InCommitTimestampSpec extends AnyFunSuite with SparkFixture {

  private def df(ids: Long*) = {
    import spark.implicits._
    ids.map(i => (i, s"r$i")).toDF("id", "v")
  }

  private def copyTree(src: Path, dst: Path): Unit = {
    val st = Files.walk(src)
    try {
      val it = st.iterator()
      while (it.hasNext) {
        val p = it.next()
        val t = dst.resolve(src.relativize(p).toString)
        if (Files.isDirectory(p)) Files.createDirectories(t)
        else Files.copy(p, t, StandardCopyOption.COPY_ATTRIBUTES)
      }
    } finally st.close()
  }

  test("records carry monotonic in-commit timestamps; history and travel use them") {
    val t = Files.createTempDirectory("graft_ict_").toString
    SnapshotLog.commit(spark, df(1), t)
    SnapshotLog.commit(spark, df(2), t, append = true)
    SnapshotLog.commit(spark, df(3), t, append = true)
    val ts = (1L to 3L).map(v => SnapshotLog.readRecord(t, v).ts)
    assert(ts.forall(_ > 0L), s"every record stamps: $ts")
    assert(ts == ts.sorted && ts.distinct == ts, s"strictly monotonic: $ts")
    // travel lands between commits by the RECORDED instants
    assert(SnapshotLog.versionAsOfTimestamp(t, ts(1)) == 2L)
    assert(SnapshotLog.versionAsOfTimestamp(t, ts(1) - 1L) == 1L)
    val h = SnapshotLog.history(spark, t).orderBy("version").collect()
    assert(h.map(_.getTimestamp(4).getTime).toSeq == ts)
  }

  test("timestamp travel SURVIVES a directory copy/restore that rewrites every mtime") {
    val src = Files.createTempDirectory("graft_ict_src_")
    val t = src.toString
    SnapshotLog.commit(spark, df(1), t)
    SnapshotLog.commit(spark, df(2), t, append = true)
    val betweenTs = SnapshotLog.readRecord(t, 1L).ts
    // "restore from backup": copy the tree, then clobber every mtime
    // (what rsync/untar without -p, or an object-store copy, does)
    val dst = Files.createTempDirectory("graft_ict_dst_").resolve("t")
    copyTree(src, dst)
    val future = FileTime.fromMillis(System.currentTimeMillis() + 3600L * 1000L)
    val st = Files.walk(dst)
    try { val it = st.iterator(); while (it.hasNext) Files.setLastModifiedTime(it.next(), future) }
    finally st.close()
    // mtime-based resolution would now answer "nothing existed yet";
    // the recorded instants keep history intact
    assert(SnapshotLog.versionAsOfTimestamp(dst.toString, betweenTs) == 1L)
    assert(SnapshotLog.read(spark, dst.toString,
      Some(SnapshotLog.versionAsOfTimestamp(dst.toString, betweenTs)))
      .count() == 1L)
  }

  test("a restored MIXED history (pre-ICT prefix, ICT suffix) clamps: travel still finds the ICT versions") {
    val t = Files.createTempDirectory("graft_ict_mixed_").toString
    SnapshotLog.commit(spark, df(1), t)
    SnapshotLog.commit(spark, df(2), t, append = true)
    // make v1 pre-ICT and clobber its mtime an hour FORWARD (the
    // restore case): its raw instant now exceeds v2's recorded one
    val p = Paths.get(t, "_graft_log", "v1.json")
    Files.writeString(p, Files.readString(p).replaceAll(""""ts":\d+,?""", ""))
    Files.setLastModifiedTime(p,
      FileTime.fromMillis(System.currentTimeMillis() + 3600L * 1000L))
    val ict2 = SnapshotLog.readRecord(t, 2L).ts
    // without the right-clamp this errored "nothing at or before":
    // v1's effective instant caps at v2's recorded one
    assert(SnapshotLog.versionAsOfTimestamp(t, ict2) == 2L)
    assert(SnapshotLog.versionAsOfTimestamp(t, ict2 - 1L) == 1L)
  }

  test("pre-ICT records (no ts field) fall back to mtime — old tables keep working") {
    val t = Files.createTempDirectory("graft_ict_old_").toString
    SnapshotLog.commit(spark, df(1), t)
    // strip the ts field in place: the record becomes pre-ICT history
    val p = Paths.get(t, "_graft_log", "v1.json")
    val json = Files.readString(p)
    Files.writeString(p, json.replaceAll(""""ts":\d+,?""", "")
      .replaceAll(""",\}""", "}"))
    assert(SnapshotLog.readRecord(t, 1L).ts == 0L)
    val mtime = Files.getLastModifiedTime(p).toMillis
    assert(SnapshotLog.commitTimestamp(t, 1L) == mtime)
    assert(SnapshotLog.versionAsOfTimestamp(t, mtime) == 1L)
  }
}
