package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Randomized model check for the native as-of join: 15 pinned-seed
  * datasets x {backward, forward, nearest, backward+tolerance,
  * nearest+tolerance}, each compared row-for-row against a pure-Scala
  * reference model. Catches semantic drift the example-based specs
  * can't enumerate — dense timestamp ties, empty key groups, keys
  * present on one side only, tolerance boundaries — under a shuffle
  * width that scatters keys across partitions. (Raw seeded
  * randomization: the scalatest<->scalacheck bridge is not among the
  * resolvable deps.) */
class AsofJoinModelSpec extends AnyFunSuite with SparkFixture {

  /** The documented contract, in one pure function: among same-key
    * right rows passing the direction + tolerance window, backward
    * takes the max rts <= t, forward the min rts >= t, nearest the
    * smallest |rts - t| with ties resolving backward. */
  private def model(t: Long, rights: Seq[Long], dir: String,
      tol: Option[Long]): Option[Long] = {
    def inTol(r: Long) = tol.forall(x => math.abs(r - t) <= x)
    dir match {
      case AsofDirection.Backward =>
        rights.filter(r => r <= t && inTol(r)).sorted.lastOption
      case AsofDirection.Forward =>
        rights.filter(r => r >= t && inTol(r)).sorted.headOption
      case AsofDirection.Nearest =>
        val c = rights.filter(inTol)
        if (c.isEmpty) None
        else Some(c.minBy(r => (math.abs(r - t), r > t))) // tie -> backward
    }
  }

  test("native operator equals the reference model across 15 seeded datasets x 5 configs") {
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      for (seed <- 1 to 15) {
        val rnd = new scala.util.Random(seed.toLong)
        val nKeys = 1 + rnd.nextInt(4)
        // dense ts domain (0..12) so ties and exact-boundary hits are common
        val left = (0 until (3 + rnd.nextInt(12))).map(i =>
          (i.toLong, rnd.nextInt(nKeys + 1).toLong, rnd.nextInt(13).toLong))
        val right = (0 until (3 + rnd.nextInt(12)))
          .map(_ => (rnd.nextInt(nKeys + 1).toLong, rnd.nextInt(13).toLong))
          .distinct // the operator's contract: right (key, ts) unique
          .map { case (k, ts) => (k, ts, k * 1000 + ts) } // payload identifies the row
        val rightByKey = right.groupBy(_._1).map { case (k, v) => (k, v.map(_._2)) }
        val lDf = left.toDF("id", "k", "ts").repartition(5)
        val rDf = right.toDF("rk", "rts", "payload").repartition(5)
        val configs = Seq(
          (AsofDirection.Backward, None),
          (AsofDirection.Forward, None),
          (AsofDirection.Nearest, None),
          (AsofDirection.Backward, Some(2L)),
          (AsofDirection.Nearest, Some(1L)))
        for ((dir, tol) <- configs) {
          val out = AsofJoin(lDf, rDf, by = ("k", "rk"), ts = ("ts", "rts"),
              direction = dir, tolerance = tol)
            .select(col("id"), col("rts"))
            .collect().map(r => r.getLong(0) ->
              (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
          left.foreach { case (id, k, t) =>
            val want = model(t, rightByKey.getOrElse(k, Nil), dir, tol)
            assert(out.get(id).contains(want),
              s"seed=$seed dir=$dir tol=$tol left(id=$id,k=$k,ts=$t): " +
                s"native=${out.get(id)} model=$want rights=${rightByKey.getOrElse(k, Nil).sorted}")
          }
          assert(out.size == left.size,
            s"seed=$seed dir=$dir: every left row must surface exactly once")
        }
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
