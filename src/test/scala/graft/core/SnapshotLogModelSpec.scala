package graft.core

import scala.util.Random
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Randomized model check of the transaction log: a random sequence of
  * replace / append / merge / CDC-apply / compact (plain + clustered)
  * / idempotent-txn / vacuum / merge-on-read delete (deletion vector)
  * operations runs against both the real log
  * and a trivial in-memory model (version -> row map). After every
  * operation the head must match the model, and at the end every
  * surviving version must time-travel to exactly the model's snapshot
  * while vacuumed versions must refuse to read. This pins the log's
  * algebra — the per-feature specs pin each guarantee in isolation;
  * this pins their COMPOSITION under interleavings nobody wrote by
  * hand. Seed 3 runs a LONG chain (24 ops) so the sequence crosses a
  * checkpoint boundary and then vacuums past it — delta-record replay,
  * checkpoint resolution, and vacuum's re-basing all compose. */
class SnapshotLogModelSpec extends AnyFunSuite with SparkFixture {

  private def df(rows: Map[Long, String]) = {
    import spark.implicits._
    rows.toSeq.toDF("id", "payload")
  }

  private def readAll(t: String, v: Option[Long] = None): Map[Long, String] =
    SnapshotLog.read(spark, t, v).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  test("random op sequences: the log agrees with the model at every step (3 seeds)") {
    (1 to 3).foreach { seed =>
      val rnd = new Random(seed)
      val t = java.nio.file.Files.createTempDirectory("graft_snapmodel_").toString
      var model = Map.empty[Long, Map[Long, String]] // version -> rows
      var nextId = 0L
      var nextBatch = 0L
      def freshRows(n: Int): Map[Long, String] =
        (1 to n).map { _ => nextId += 1; nextId -> s"v$nextId" }.toMap

      SnapshotLog.commit(spark, df(freshRows(3)), t)
      model += 1L -> (1 to 3).map(i => i.toLong -> s"v$i").toMap
      var vacuumedBelow = 1L

      val nOps = if (seed == 3) 24 else 9 // seed 3 crosses the v20 checkpoint
      (1 to nOps).foreach { _ =>
        val head = model.keys.max
        rnd.nextInt(8) match {
          case 0 => // replace
            val rows = freshRows(1 + rnd.nextInt(3))
            val v = SnapshotLog.commit(spark, df(rows), t)
            model += v -> rows
          case 1 => // append
            val rows = freshRows(1 + rnd.nextInt(3))
            val v = SnapshotLog.commit(spark, df(rows), t, append = true)
            model += v -> (model(head) ++ rows)
          case 2 => // merge: update one existing key (if any) + insert one
            val existing = model(head).keys.toSeq.sorted
            val upd = (if (existing.nonEmpty)
              Map(existing(rnd.nextInt(existing.size)) -> "updated")
            else Map.empty[Long, String]) ++ freshRows(1)
            val v = SnapshotLog.merge(spark, t, df(upd), "id")
            model += v -> (model(head) ++ upd)
          case 3 => // compact: content-preserving new version (clustered
            // half the time — stats-preserving rewrite path)
            val v =
              if (rnd.nextBoolean()) SnapshotLog.compact(spark, t, targetFiles = 1)
              else SnapshotLog.compact(spark, t, targetFiles = 2, clusterBy = Seq("id"))
            model += v -> model(head)
          case 4 => // CDC apply: delete one existing key, update another,
            // insert a fresh one — atomically
            import spark.implicits._
            val existing = model(head).keys.toSeq.sorted
            val delKey = existing.headOption
            val updKey = existing.drop(1).headOption
            val ins = freshRows(1)
            val changes =
              delKey.map(k => (k, "x", "D")).toSeq ++
                updKey.map(k => (k, "cdc-upd", "U")).toSeq ++
                ins.map { case (k, p) => (k, p, "I") }.toSeq
            val v = SnapshotLog.applyChanges(spark, t,
              changes.toDF("id", "payload", "op"), "id")
            model += v -> (model(head) -- delKey ++
              updKey.map(_ -> "cdc-upd") ++ ins)
          case 5 => // idempotent txn append + an immediate replay of the
            // SAME batch: exactly one commit may land
            nextBatch += 1
            val rows = freshRows(1)
            val v = SnapshotLog.commit(spark, df(rows), t, append = true,
              txn = Some(("model", nextBatch)))
            val replayed = SnapshotLog.commit(spark, df(rows), t, append = true,
              txn = Some(("model", nextBatch)))
            assert(replayed == v, s"seed=$seed: a replayed txn batch must be a no-op")
            model += v -> (model(head) ++ rows)
          case 6 => // vacuum everything older than the head
            SnapshotLog.vacuum(t, keepFrom = head)
            model = model.filter(_._1 >= head)
            vacuumedBelow = math.max(vacuumedBelow, head)
          case 7 => // merge-on-read delete: kill a random id band via a
            // deletion vector (no files rewritten; readers apply it)
            val lo = rnd.nextLong(math.max(nextId, 1L)) + 1L
            val hi = lo + rnd.nextInt(4)
            val v = SnapshotLog.deleteWhere(spark, t,
              SnapshotLog.Pred.Between("id", lo.toDouble, hi.toDouble))
            val after = model(head).filter { case (id, _) => id < lo || id > hi }
            if (v > head) model += v -> after
            else assert(after == model(head),
              s"seed=$seed: deleteWhere no-op'd but the model changed")
        }
        assert(readAll(t) == model(model.keys.max),
          s"seed=$seed: head diverged from the model after an op")
      }

      // every surviving version time-travels to the model's snapshot
      model.keys.toSeq.sorted.foreach { v =>
        assert(readAll(t, Some(v)) == model(v), s"seed=$seed: v$v diverged")
      }
      assert(SnapshotLog.versions(t).toSet == model.keys.toSet,
        s"seed=$seed: version sets diverged")
      // vacuumed versions refuse to read rather than resurrecting
      (1L until vacuumedBelow).filterNot(model.contains).take(2).foreach { v =>
        intercept[Exception] { readAll(t, Some(v)) }
      }
    }
  }
}
