package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** A decoded-media feature row (see Multimodal.extractFeatures). */
final case class MediaFeature(
    doc_id: Long, kind: String, n_bytes: Long, byte_sum: Long, avg_byte: Double)

/** Multimodal-column plumbing (SURVEY §2b / builder prompt): media as
  * opaque `binary` payloads + a typed metadata struct, with
  * decode/feature-extraction as partition-wise typed transforms.
  *
  * The actual codec is STUBBED — this container has no image/audio
  * libraries — with a deterministic fake "decoder" that reads the raw
  * bytes (see `decodeStub`). Everything around it is real and tested:
  * the schema (binary + struct), the Dataset encoder, the
  * mapPartitions batch shape (one decoder init per partition, the same
  * shape a JNI/FFmpeg binding needs), and the downstream SQL.
  *
  * Scale: payloads never shuffle — features are extracted map-side and
  * only the small typed rows move. A real pipeline would store media
  * in object storage and keep (pointer, metadata) here; the operators
  * below are unchanged by that swap.
  */
object Multimodal {

  /** Deterministic media table synthesized from `documents`: payload =
    * UTF-8 bytes of the text; kind/width/height/duration derived from
    * stable columns. (Stands in for a real binary ingest; the plumbing
    * downstream is representation-independent.) */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        when(pmod(col("doc_id"), lit(3)) === 0, "image")
          .when(pmod(col("doc_id"), lit(3)) === 1, "audio")
          .otherwise("video").as("kind"),
        (pmod(col("n_chars"), lit(64)) + 1).cast("int").as("width"),
        (pmod(col("n_chars"), lit(48)) + 1).cast("int").as("height"),
        (col("n_chars") * 10).cast("bigint").as("duration_ms")).as("meta"))

  /** The stubbed decoder: consumes raw payload bytes, emits summary
    * "features". A real implementation would replace ONLY the body of
    * the per-row function (decode image -> pixels -> features); the
    * partition iterator shape — init once per partition, stream rows —
    * is exactly what a native decoder binding needs. */
  private def decodeStub(payload: Array[Byte]): (Long, Long, Double) = {
    // ??? <- real codec goes here; deterministic fake below
    var sum = 0L
    var i = 0
    while (i < payload.length) { sum += payload(i) & 0xff; i += 1 }
    val n = payload.length.toLong
    (n, sum, if (n == 0) 0.0 else sum.toDouble / n)
  }

  /** Partition-wise typed feature extraction over the binary column. */
  def extractFeatures(spark: SparkSession, dir: String): Dataset[MediaFeature] = {
    import spark.implicits._
    mediaTable(spark, dir)
      .select(col("doc_id"), col("meta.kind").as("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // decoder init would happen HERE, once per partition
        rows.map { case (id, kind, payload) =>
          val (n, sum, avg) = decodeStub(payload)
          MediaFeature(id, kind, n, sum, avg)
        }
      }
  }

  /** Feature report as a DataFrame query (oracle-checkable because the
    * synthetic payload is the text's bytes and the corpus is ASCII). */
  def features(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(spark, dir).toDF()
      // Empty payloads carry no features: the oracle's LATERAL unnest
      // emits no rows for them, so filtering here keeps the two engines
      // aligned on any corpus AND guards the avg division.
      .filter(col("n_bytes") > 0)
      // round here with Spark's HALF_UP (matches DuckDB's round), not in
      // the typed row (math.rint is half-even)
      .select(col("doc_id"), col("kind"), col("n_bytes"), col("byte_sum"),
              round(col("byte_sum").cast("double") / col("n_bytes"), 4).as("avg_byte"))
      .orderBy("doc_id")

  /** Resize planning for "image" media: target box fit (max 32x32,
    * aspect preserved, ceil-rounded) computed over metadata only — the
    * payload transform itself is the stubbed codec's job; the SCHEDULE
    * (which rows, what targets, estimated output bytes) is the Spark
    * side and is exact. */
  def resizePlan(spark: SparkSession, dir: String, box: Int = 32): DataFrame =
    mediaTable(spark, dir)
      .filter(col("meta.kind") === "image")
      .select(col("doc_id"),
        col("meta.width").as("width"), col("meta.height").as("height"))
      .withColumn("scale_pct", // floor EXPLICITLY: Spark's double->int cast
        // truncates but DuckDB's rounds — floor() agrees everywhere
        floor(lit(box * 100) / greatest(col("width"), col("height"))).cast("bigint"))
      .select(col("doc_id"), col("width"), col("height"), col("scale_pct"),
        ceil(col("width") * col("scale_pct") / 100.0).cast("int").as("out_w"),
        ceil(col("height") * col("scale_pct") / 100.0).cast("int").as("out_h"))
      .orderBy("doc_id")

  /** Frame sampling for "video" media: one row per sampled frame at a
    * 1000ms stride — pure SQL over the metadata (no payload shuffle). */
  def frameSample(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .filter(col("meta.kind") === "video")
      .select(col("doc_id"),
        posexplode(sequence(lit(0L), col("meta.duration_ms"), lit(1000L))))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "offset_ms")
      .select(col("doc_id"), col("frame_idx").cast("bigint").as("frame_idx"), col("offset_ms"))
      .orderBy("doc_id", "frame_idx")
}
