package graft.core

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Pins the driver-generated corpus schema contract (TESTDATA.md) in ONE
  * obvious place, so the next testdata regeneration fails loudly here
  * instead of deep inside a streaming spec (VERDICT r6 #2: the 2026-08-13
  * regen flipped `events.ts` from int64-nanos to timestamp[us] and the
  * only symptom was a ClassCastException three layers into
  * StreamMultiBatchSpec).
  *
  * Two tables get special treatment:
  *  - `events.ts` may legitimately be LongType nanos (when the session
  *    sets `spark.sql.legacy.parquet.nanosAsLong` and the file is
  *    TIMESTAMP(NANOS)) or a timestamp flavor (TimestampNTZType today:
  *    µs, no UTC-adjust flag; TimestampType if a regen sets it). All are
  *    forms `Tables.events` dispatches on; anything else is a break.
  *  - everything else is pinned exactly. Note the driver's parquet has
  *    NO isAdjustedToUTC flag, so timestamp columns surface as NTZ —
  *    harmless because sessions run with UTC session timezone.
  */
class CorpusContractSpec extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.001"

  private def fields(name: String): Map[String, DataType] =
    spark.read.parquet(s"$sf/$name.parquet").schema
      .fields.map(f => f.name -> f.dataType).toMap

  private val exact: Map[String, Map[String, DataType]] = Map(
    "region" -> Map("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Map("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Map("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Map("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Map("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Map("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Map("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    "documents" -> Map("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Map("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType)
  )

  for ((table, want) <- exact.toSeq.sortBy(_._1))
    test(s"$table read-back schema matches the pinned contract") {
      val got = fields(table)
      assert(got == want,
        s"corpus schema drift for `$table`:\n  extra: ${got.keySet -- want.keySet}" +
          s"\n  missing: ${want.keySet -- got.keySet}" +
          s"\n  retyped: ${want.collect { case (k, t) if got.get(k).exists(_ != t) => s"$k ${got(k)} != $t" }}")
    }

  test("events schema matches the contract; ts is one of the two accepted forms") {
    val got = fields("events")
    val nonTs = got - "ts"
    assert(nonTs == Map("event_id" -> LongType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType))
    assert(got.get("ts").exists(t =>
      t == LongType || t == TimestampType || t == TimestampNTZType),
      s"events.ts must be LongType-nanos or a timestamp flavor (Tables.events dispatch), got ${got.get("ts")}")
  }

  test("nanosAsLong flag is dormant on the current corpus (ts already timestamp)") {
    // Verify/Bench/fixture all set spark.sql.legacy.parquet.nanosAsLong.
    // With a TIMESTAMP(MICROS) file the flag is a no-op; this assertion
    // documents that and will flip the day the corpus goes back to nanos.
    assert(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true")
    assert(fields("events")("ts") != LongType,
      "corpus regenerated as TIMESTAMP(NANOS)? nanosAsLong is now LOAD-BEARING " +
        "— revisit Tables.events callers that assume µs grain")
  }
}
