package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, ENGINE-PORTABLE hashing for the approximate operators
  * (MinHash / SimHash / random-hyperplane LSH). Everything here is
  * definable in ANSI-ish SQL, so the DuckDB oracle can replay the exact
  * same sketch: hash = integer value of the first 15 hex chars of
  * md5(s) (60 bits, always positive), permutations are affine maps
  * modulo the Mersenne prime 2^31-1 with md5-derived coefficients.
  *
  * xxhash64 (the obvious Spark-native choice) is NOT reproducible
  * outside Spark — these operators were unverifiable engine-hash
  * islands in round 1. md5 costs ~2x xxhash64 on the token path, which
  * the bench shows is noise at any scale factor.
  */
object DetHash {
  /** 2^31 - 1: modulus for affine MinHash permutations. a*h+b stays
    * under 2^62, so 64-bit arithmetic never overflows (DuckDB raises
    * on BIGINT overflow rather than wrapping — the sketch must stay
    * inside the checked range in BOTH engines). */
  val Mersenne31: Long = 2147483647L

  /** Column form: first-60-bits-of-md5 as a non-negative long.
    * DuckDB twin:
    *   list_reduce(list_transform(generate_series(1,15), i ->
    *     strpos('0123456789abcdef', substring(md5(s), i, 1))::BIGINT - 1),
    *     (a,b) -> a*16+b)
    */
  def hex60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Driver-side twin of hex60 for deriving CONSTANTS (perm
    * coefficients, hyperplane components) — same md5, same 15-hex-char
    * truncation, so SQL-recomputed constants match exactly. */
  def hex60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  /** MinHash permutation coefficients: a_j in [1, M-1], b_j in [0, M-1]
    * from tagged md5 — reproducible in SQL as
    * (hex60('a:'||j) % (M-1)) + 1 and hex60('b:'||j) % M. */
  def permA(j: Int): Long = hex60(s"a:$j") % (Mersenne31 - 1) + 1
  def permB(j: Int): Long = hex60(s"b:$j") % Mersenne31

  /** Random-hyperplane component in [-1, 1]: (hex60('p:j:i') % 2001 -
    * 1000) / 1000 — the SQL twin rebuilds each plane as a LIST aligned
    * with the embedding's index order. */
  def planeComp(j: Int, i: Int): Double =
    (hex60(s"p:$j:$i") % 2001 - 1000) / 1000.0
}
