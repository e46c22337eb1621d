package graft.core

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
import java.nio.file.{Files, Path, Paths}

import scala.util.control.NonFatal

import org.apache.spark.util.sketch.BloomFilter

import graft.core.SnapshotLog.{FileEntry, Pred}

/** PER-FILE BLOOM-FILTER INDEXES — Delta's bloom filter index, the
  * file-skipping tier min/max bounds cannot provide (reference scope:
  * pgcp replays btree/hash indexes, postgres.rb:243-261; at 100 TB the
  * analogous ask is "find the row for THIS id without scanning").
  *
  * Min/max bounds prune RANGE-clustered layouts. A point lookup on a
  * high-cardinality column that is NOT the clustering key (a document
  * id, a URL, a user uuid) overlaps every file's [lo, hi] and scans
  * the table. A per-file Bloom filter answers "is key k possibly in
  * this file" in O(1) with no false negatives, so equality and IN
  * predicates skip every file whose filter misses — at 100 TB the
  * difference between opening 3 files and opening 100,000.
  *
  * Shape:
  *  - CONFIG rides the table's log properties (`graft.bloom.columns`,
  *    logical names, resolved through column mapping at commit time;
  *    `graft.bloom.fpp`; `graft.bloom.items` = expected distinct keys
  *    per FILE). `ALTER TABLE ... SET TBLPROPERTIES` turns it on; files
  *    written before that simply have no sidecar and are always read.
  *  - WRITE side: the commit's single stats pass
  *    (`groupBy(input_file_name)`) additionally aggregates a
  *    `BloomFilterAggregate` over `xxhash64(value-view)` per indexed
  *    column — one filter per (file, column), no extra pass. Filters
  *    land in ONE sidecar per data file under `idx/<stage>/` (the
  *    deletion-vector sidecar pattern), referenced by the manifest
  *    entry's `idx` field. Deletion vectors only REMOVE rows, so a
  *    file's filter stays sound (only false positives) across DVs;
  *    OPTIMIZE recomputes sidecars because compaction rides the same
  *    commit path.
  *  - READ side: equality atoms (`Eq`/`StrEq`/`In`/`StrIn`) of the
  *    pushed + runtime predicate tree probe the sidecar under
  *    three-valued logic — a filter miss proves the atom FALSE for the
  *    file, any other answer is unknown. Files whose whole tree is
  *    provably false are skipped. The DRIVER consults sidecars only
  *    while the bounds-surviving set is small (`graft.bloom.
  *    driverMaxFiles`, default 2048 — it never loads O(table) index
  *    bytes); past that the probe moves to the EXECUTORS, where each
  *    task tests its own file's sidecar (~KBs) before opening the
  *    parquet (~100s of MB) — per-file cost, perfectly parallel.
  *
  * Hash contract (write and probe must agree bit-for-bit): string
  * columns hash their raw value (`xxhash64(col)`, seed 42); every
  * numeric/timestamp column hashes its DOUBLE VIEW — the same
  * `numericView` cast the min/max stats pass uses — so the `Pred.Eq`
  * doubles the filter translation produces probe the exact longs the
  * writer inserted. Predicates that only bound a range (`Between`,
  * slacked timestamp points) never consult the filter.
  */
object BloomIndex {
  /** Comma-separated LOGICAL column names to index. */
  val ColumnsProp = "graft.bloom.columns"
  /** Target false-positive rate per (file, column) filter. */
  val FppProp = "graft.bloom.fpp"
  /** Expected distinct keys per FILE (sizes the filter). */
  val ItemsProp = "graft.bloom.items"
  /** Max bounds-surviving files the DRIVER will probe sidecars for;
    * larger scans defer the probe to the executors. */
  val DriverMaxProp = "graft.bloom.driverMaxFiles"
  /** Max TOTAL sidecar bytes the driver will read per scan (checked by
    * cheap size stats before any read): a candidate set under the file
    * cap can still carry GBs of filters when `items` is large — past
    * this the probe moves to the executors too. */
  val DriverMaxBytesProp = "graft.bloom.driverMaxBytes"

  val DefaultFpp = 0.01
  val DefaultItems = 100000L
  val DefaultDriverMax = 2048
  val DefaultDriverMaxBytes = 64L << 20

  /** Parsed bloom config; `cols` as stored in the property (LOGICAL
    * names — callers translate through column mapping). */
  final case class Spec(cols: Seq[String], fpp: Double, items: Long) {
    def numBits: Long = BloomFilter.optimalNumOfBits(items, fpp)
  }

  def specOf(props: Map[String, String]): Option[Spec] = {
    val cols = props.get(ColumnsProp).toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    if (cols.isEmpty) None
    else {
      val fpp = props.get(FppProp).map(_.toDouble).getOrElse(DefaultFpp)
      val items = props.get(ItemsProp).map(_.toLong).getOrElse(DefaultItems)
      require(fpp > 0.0 && fpp < 1.0, s"$FppProp must be in (0, 1), got $fpp")
      require(items > 0L && items <= 4000000L,
        s"$ItemsProp must be in [1, 4000000] (Catalyst's bloom aggregate " +
          s"cap), got $items")
      val spec = Spec(cols.distinct, fpp, items)
      require(spec.numBits <= 67108864L,
        s"bloom filter would need ${spec.numBits} bits (> 64Mbit cap) — " +
          s"lower $ItemsProp or raise $FppProp")
      Some(spec)
    }
  }

  def driverMax(props: Map[String, String]): Int =
    props.get(DriverMaxProp).map(_.toInt).getOrElse(DefaultDriverMax)
  def driverMaxBytes(props: Map[String, String]): Long =
    props.get(DriverMaxBytesProp).map(_.toLong).getOrElse(DefaultDriverMaxBytes)

  /** Driver-tier admission by BYTES: size stats (no reads) over the
    * candidates' sidecars, minus those already memoized in `cache`. */
  def withinDriverBytes(tableRoot: String, entries: Seq[FileEntry], maxBytes: Long,
                        cached: String => Boolean): Boolean = {
    var total = 0L
    entries.foreach(_.idx.foreach { rel =>
      if (!cached(rel)) {
        try total += Files.size(sidecarPath(tableRoot, rel))
        catch { case NonFatal(_) => () } // missing sidecar reads nothing
      }
    })
    total <= maxBytes
  }

  // --------------------------------------------------------- sidecar codec

  private val Magic = 0x47424c4d // "GBLM"

  /** One sidecar = every indexed column's serialized filter for ONE
    * data file. Written create-new under the commit's own `idx/<stage>`
    * directory (immutable, like data files — vacuum retires them with
    * their entry). */
  def writeSidecar(path: Path, blooms: Seq[(String, Array[Byte])]): Unit = {
    Files.createDirectories(path.getParent)
    val out = new DataOutputStream(new BufferedOutputStream(
      Files.newOutputStream(path)))
    try {
      out.writeInt(Magic)
      out.writeInt(1) // codec version
      out.writeInt(blooms.size)
      blooms.foreach { case (c, b) =>
        out.writeUTF(c)
        out.writeInt(b.length)
        out.write(b)
      }
    } finally out.close()
  }

  /** Column (PHYSICAL name) -> deserialized filter. Fails loudly on a
    * corrupt sidecar — callers treat failure as "no index" (read the
    * file), never as "skip". */
  def readSidecar(path: Path): Map[String, BloomFilter] = {
    val in = new DataInputStream(new BufferedInputStream(
      Files.newInputStream(path)))
    try {
      require(in.readInt() == Magic, s"$path is not a graft bloom sidecar")
      val ver = in.readInt()
      require(ver == 1, s"bloom sidecar $path has codec version $ver (> 1)")
      val n = in.readInt()
      (0 until n).map { _ =>
        val c = in.readUTF()
        val b = new Array[Byte](in.readInt())
        in.readFully(b)
        c -> BloomFilter.readFrom(b)
      }.toMap
    } finally in.close()
  }

  // -------------------------------------------------------------- probing

  /** Probe hashes — MUST mirror the write side's `xxhash64` over the
    * staged column view (strings raw, numerics through the double
    * view), seed 42. */
  def hashString(v: String): Long =
    org.apache.spark.sql.graft.Bridge.xxhash64Of(
      v, org.apache.spark.sql.types.StringType)
  def hashDouble(v: Double): Long =
    org.apache.spark.sql.graft.Bridge.xxhash64Of(
      v, org.apache.spark.sql.types.DoubleType)

  /** Does any atom of `p` have a shape a bloom filter could answer?
    * (Cheap pre-check that gates all sidecar IO.) */
  def bloomable(p: Pred): Boolean = p match {
    case Pred.Eq(_, _) | Pred.StrEq(_, _) | Pred.In(_, _) | Pred.StrIn(_, _) => true
    case Pred.And(ps @ _*) => ps.exists(bloomable)
    case Pred.Or(ps @ _*) => ps.forall(bloomable) // an Or skips only if EVERY branch can
    case _ => false
  }

  /** Three-valued evaluation against one file's filters: Some(false) =
    * provably no row of the file satisfies `p`; None = unknown (bloom
    * filters prove only ABSENCE — there is no Some(true)). */
  private def eval(bl: Map[String, BloomFilter], p: Pred): Option[Boolean] = {
    def miss(c: String, h: Long): Option[Boolean] =
      bl.get(c).flatMap(f => if (!f.mightContainLong(h)) Some(false) else None)
    p match {
      case Pred.Eq(c, v) => miss(c, hashDouble(v))
      case Pred.StrEq(c, v) => miss(c, hashString(v))
      case Pred.In(c, vs) =>
        bl.get(c).flatMap(f =>
          if (vs.forall(v => !f.mightContainLong(hashDouble(v)))) Some(false) else None)
      case Pred.StrIn(c, vs) =>
        bl.get(c).flatMap(f =>
          if (vs.forall(v => !f.mightContainLong(hashString(v)))) Some(false) else None)
      case Pred.And(ps @ _*) =>
        if (ps.exists(eval(bl, _).contains(false))) Some(false) else None
      case Pred.Or(ps @ _*) =>
        if (ps.nonEmpty && ps.forall(eval(bl, _).contains(false))) Some(false) else None
      case _ => None
    }
  }

  /** True when the file's sidecar PROVES `p` matches no row. A missing
    * or unreadable sidecar is never a skip (conservative: read the
    * file) — a vacuumed index degrades to a slower scan, not a wrong
    * answer. */
  /** Sidecar refs resolve table-relative unless recorded ABSOLUTE
    * (shallow-clone entries point at the source's sidecars). */
  private def sidecarPath(tableRoot: String, rel: String): Path =
    if (rel.startsWith("/")) Paths.get(rel) else Paths.get(tableRoot, rel)

  def provablyEmpty(tableRoot: String, e: FileEntry, p: Pred): Boolean =
    e.idx.exists { rel =>
      try eval(readSidecar(sidecarPath(tableRoot, rel)), p).contains(false)
      catch { case NonFatal(_) => false }
    }

  /** Same proof over a pre-loaded sidecar map (the executor probe,
    * which reads the sidecar once per task). */
  def provablyEmpty(bl: Map[String, BloomFilter], p: Pred): Boolean =
    eval(bl, p).contains(false)

  /** DRIVER-side prune: drop entries whose sidecars prove `p` empty.
    * Consulted only while the candidate set is small (`max`) — past
    * that the caller leaves the probe to the executors, so the driver
    * never loads O(table) sidecar bytes. Sidecar reads memoize into
    * `cache` (scan-lifetime) so re-planning does not re-read. */
  def prune(tableRoot: String, entries: Seq[FileEntry], p: Pred, max: Int,
            cache: scala.collection.mutable.Map[String, Option[Map[String, BloomFilter]]])
      : Seq[FileEntry] = {
    if (entries.size > max || !bloomable(p) || !entries.exists(_.idx.isDefined))
      return entries
    entries.filterNot { e =>
      e.idx.exists { rel =>
        cache.getOrElseUpdate(rel,
          try Some(readSidecar(sidecarPath(tableRoot, rel)))
          catch { case NonFatal(_) => None }
        ).exists(provablyEmpty(_, p))
      }
    }
  }
}
