package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Text-pipeline operators over `documents` (SURVEY §2b "LLM-pipeline"):
  * exact + near-dup dedup (MinHash-LSH, SimHash, exact n-gram Jaccard),
  * token statistics, language-ID heuristic, quality scoring, content
  * fingerprinting.
  *
  * Performance discipline: `split(text)` is ALWAYS materialized once
  * as a named column (`t`) before any higher-order function touches
  * it — HOF lambdas are interpreted, and an unnamed split inside a
  * lambda re-tokenizes the document per element (measured 10x slower).
  * Shingles are 64-bit-hashed before any join/groupBy so shuffles move
  * longs, not strings (measured 2x on the inverted-index join).
  *
  * Scale notes: every op here is one or two shuffles over exploded
  * token/shingle rows; nothing collects to the driver. MinHash keeps
  * the signature as 64 agg expressions in a single hash-aggregate pass
  * (no 64x row blowup); LSH banding turns the quadratic all-pairs
  * problem into a groupBy on (band, band_hash) — the 100 TB path.
  */
object Text {

  /** documents + tokens materialized once as `t`. */
  private def tokenized(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).withColumn("t", split(col("text"), " "))

  /** Distinct word-3-shingles as an array of 64-bit hashes, built by
    * hash-chaining three aligned slices with `zip_with` — NO token
    * array reference inside a per-element lambda. (CollapseProject
    * inlines named columns into lambdas, so an `element_at(t, i)`
    * formulation re-splits the document per element — observed via
    * jstack as StringSplit.eval inside ArrayTransform, O(len^2) per
    * row. Slices are top-level args: the split evaluates O(1) times
    * per row no matter what the optimizer inlines.) Hash domain keeps
    * every downstream shuffle on fixed-width longs; Jaccard counts are
    * unchanged (collision odds ~2^-64 per pair). */
  private def shingleHashes: Column = {
    val n = greatest(size(col("t")) - 2, lit(0))
    val s1 = slice(col("t"), lit(1), n)
    val s2 = slice(col("t"), lit(2), n)
    val s3 = slice(col("t"), lit(3), n)
    array_distinct(
      zip_with(zip_with(s1, s2, (x, y) => xxhash64(x, y)), s3,
        (h, z) => xxhash64(h, z)))
  }

  /** doc_id -> exploded hashed shingles. The Generate (explode) is an
    * optimizer barrier: everything upstream evaluates once per doc. */
  private def shingles(spark: SparkSession, dir: String): DataFrame =
    tokenized(spark, dir)
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), explode(shingleHashes).as("sh"))

  /** doc_id -> shingle-set size (per-row, shuffle-free). */
  private def shingleSizes(spark: SparkSession, dir: String): DataFrame =
    tokenized(spark, dir)
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), size(shingleHashes).cast("bigint").as("n"))

  // ---------------------------------------------------------------- exact

  /** Exact dedup: group-by full content; representative = min doc_id.
    * At scale: dedup on md5(text) first to shrink shuffle payload. */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      .select(col("doc_id"), col("fp"), col("n_copies"))
      .orderBy("doc_id")

  /** Content fingerprint report: md5 + length stats per doc. */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    tokenized(spark, dir)
      .select(col("doc_id"),
              substring(md5(col("text")), 1, 16).as("fp16"),
              octet_length(col("text")).cast("bigint").as("n_bytes"),
              size(col("t")).cast("bigint").as("n_tokens"))
      .orderBy("doc_id")

  // -------------------------------------------------------------- minhash

  val MinhashPerms = 64
  val MinhashBands = 16 // r = 64/16 = 4 rows per band

  /** doc_id -> exploded distinct shingle base hash, where the hash is
    * the ENGINE-PORTABLE hex60(md5(shingle)) % (2^31-1) — the DuckDB
    * oracle replays the identical sketch (see DetHash). Shingle strings
    * are assembled from aligned slices with zip_with (same
    * CollapseProject discipline as shingleHashes above). */
  private def shingleH(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.DetHash
    val n = greatest(size(col("t")) - 2, lit(0))
    val s1 = slice(col("t"), lit(1), n)
    val s2 = slice(col("t"), lit(2), n)
    val s3 = slice(col("t"), lit(3), n)
    val shingleStrs = array_distinct(
      zip_with(zip_with(s1, s2, (x, y) => concat_ws(" ", x, y)), s3,
        (p, z) => concat_ws(" ", p, z)))
    tokenized(spark, dir)
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), explode(shingleStrs).as("s"))
      .select(col("doc_id"), (DetHash.hex60(col("s")) % DetHash.Mersenne31).as("h"))
  }

  /** MinHash signatures: min over shingles of the affine permutation
    * (a_j*h + b_j) mod 2^31-1 for 64 md5-derived (a_j, b_j) — 64 agg
    * expressions in ONE hash-aggregate over the exploded shingles.
    * Map-side partial agg collapses each partition to one 65-long row
    * per doc before the shuffle, so the exchange moves ~docs x 520
    * bytes regardless of corpus size. */
  def minhashSignatures(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.DetHash
    val aggs = (0 until MinhashPerms).map(j =>
      min((col("h") * DetHash.permA(j) + DetHash.permB(j)) % DetHash.Mersenne31).as(s"h$j"))
    shingleH(spark, dir).groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** LSH candidate pairs: band the signature (16 bands x 4 rows), key
    * each band by its joined values, group on (band, key); docs sharing
    * any band bucket become candidates. Quadratic only within buckets. */
  def minhashCandidates(spark: SparkSession, dir: String): DataFrame = {
    val sig = minhashSignatures(spark, dir)
    val r = MinhashPerms / MinhashBands
    val bandStructs = (0 until MinhashBands).map { b =>
      val cols = (0 until r).map(i => col(s"h${b * r + i}"))
      struct(lit(b).as("band"), concat_ws(",", cols: _*).as("bh"))
    }
    val buckets = sig
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
    val ids = buckets.groupBy("band", "bh")
      .agg(sort_array(collect_set(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
    // pairs within a bucket: flatten of per-element suffix cross
    ids.select(explode(
        flatten(transform(col("ids"), (x, i) =>
          transform(slice(col("ids"), i + 2, size(col("ids"))), y =>
            struct(x.as("d1"), y.as("d2")))))).as("p"))
      .select(col("p.d1").as("d1"), col("p.d2").as("d2"))
      .distinct()
      .orderBy("d1", "d2")
  }

  /** MinHash near-dup pairs with exact-Jaccard verification of the LSH
    * candidates — the full production dedup path. Shingles are first
    * semi-filtered to candidate docs (tiny at any scale), then
    * equi-joined on hashed shingle, then pair-filtered to candidates. */
  def minhashNearDups(spark: SparkSession, dir: String, threshold: Double = 0.5): DataFrame = {
    // The candidates subtree is referenced three times below, so run the
    // full LSH pass ONCE and re-read it through a parquet barrier (the
    // same iteration-barrier discipline as dupClasses — an eager
    // localCheckpoint here measured wildly unstable under AQE, 2s-60s).
    // TempDirs.stable: repeated runs overwrite, JVM exit cleans up.
    val candPath = s"${graft.core.TempDirs.stable(s"minhash:$dir")}/cand"
    minhashCandidates(spark, dir).write.mode("overwrite").parquet(candPath)
    val cand = spark.read.parquet(candPath)
    val sh = shingles(spark, dir)
    val sizes = shingleSizes(spark, dir)
    val cd1 = cand.select("d1").distinct()
    val cd2 = cand.select("d2").distinct()
    val s1 = sh.join(cd1, sh("doc_id") === cd1("d1"), "left_semi").toDF("d1", "sh")
    val s2 = sh.join(cd2, sh("doc_id") === cd2("d2"), "left_semi").toDF("d2", "sh")
    val inter = s1.join(s2, Seq("sh"))
      .filter(col("d1") < col("d2"))
      .join(cand, Seq("d1", "d2"), "left_semi")
      .groupBy("d1", "d2").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.toDF("d1", "na"), "d1")
      .join(sizes.toDF("d2", "nb"), "d2")
      .withColumn("jaccard", round(col("inter") / (col("na") + col("nb") - col("inter")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("d1"), col("d2"), col("jaccard"))
      .orderBy("d1", "d2")
  }

  /** Duplicate-CLASS assignment: connected components over the verified
    * near-dup pairs via iterative min-label propagation — the step that
    * turns pairwise dedup output into actionable "keep one per class"
    * groups. Each iteration is one distributed join + aggregate (labels
    * propagate one hop); the driver loop only reads a convergence
    * COUNT per round (the label table itself never leaves the
    * executors), iterations are bounded by the component diameter —
    * near-dup classes are clique-like, so 2-3 rounds in practice. */
  def dupClasses(spark: SparkSession, dir: String, maxIter: Int = 20): DataFrame = {
    // Materialize the (expensive) near-dup pairs ONCE, and each label
    // round too: iterative algorithms on lazy lineage otherwise
    // re-execute the whole upstream pipeline per iteration and grow the
    // plan without bound (measured 34s -> ~3s at sf0.1). Parquet as the
    // iteration barrier is the deterministic choice (localCheckpoint
    // measured unstable under AQE in round 1). TempDirs.stable: the
    // result stays readable after return, repeated runs overwrite the
    // same files instead of filling the disk, JVM exit cleans up.
    val tmp = graft.core.TempDirs.stable(s"cc:$dir")
    minhashNearDups(spark, dir).select(col("d1"), col("d2"))
      .write.mode("overwrite").parquet(s"$tmp/pairs")
    val pairs = spark.read.parquet(s"$tmp/pairs")
    val edges = pairs.select(col("d1").as("src"), col("d2").as("dst"))
      .union(pairs.select(col("d2").as("src"), col("d1").as("dst")))
    edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .write.mode("overwrite").parquet(s"$tmp/labels")
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val labels = spark.read.parquet(s"$tmp/labels")
      val neighborMin = edges
        .join(labels.select(col("id").as("dst"), col("label").as("nl")), "dst")
        .groupBy(col("src").as("id")).agg(min(col("nl")).as("nmin"))
      val next = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"), col("label"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("nlabel"))
      next.write.mode("overwrite").parquet(s"$tmp/next")
      val mat = spark.read.parquet(s"$tmp/next")
      changed = mat.filter(col("nlabel") < col("label")).count()
      mat.select(col("id"), col("nlabel").as("label"))
        .write.mode("overwrite").parquet(s"$tmp/labels")
      iter += 1
    }
    spark.read.parquet(s"$tmp/labels")
      .select(col("id").as("doc_id"), col("label").as("class_id"))
      .orderBy("doc_id")
  }

  // ------------------------------------------------------ exact jaccard

  /** Exact all-pairs n-gram Jaccard above a threshold — the oracle-able
    * ground truth for near-dup dedup. Hashed-shingle inverted-index
    * join (pairs meet only on shared shingles), so cost is bounded by
    * shingle co-occurrence, not |docs|^2. */
  def jaccardPairs(spark: SparkSession, dir: String, threshold: Double = 0.5): DataFrame = {
    val sh = shingles(spark, dir)
    val sizes = shingleSizes(spark, dir)
    val a = sh.toDF("d1", "sh")
    val b = sh.toDF("d2", "sh")
    val inter = a.join(b, Seq("sh")).filter(col("d1") < col("d2"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.toDF("d1", "na"), "d1")
      .join(sizes.toDF("d2", "nb"), "d2")
      .withColumn("jaccard", round(col("inter") / (col("na") + col("nb") - col("inter")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("d1"), col("d2"), col("jaccard"))
      .orderBy("d1", "d2")
  }

  // -------------------------------------------------------------- simhash

  /** 60-bit SimHash per doc: per-bit +/-1 majority vote over token
    * hashes (tf-weighted — every occurrence votes), assembled into one
    * BIGINT. 60 conditional-sum agg expressions in a single pass (same
    * trick as MinHash). Token hash is the engine-portable
    * hex60(md5(tok)) so the DuckDB oracle replays the signature. */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.DetHash
    val tok = tokenized(spark, dir)
      .select(col("doc_id"), explode(col("t")).as("tok"))
      .withColumn("h", DetHash.hex60(col("tok")))
    val bitSums = (0 until 60).map(j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$j"))
    val sums = tok.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val assembled = (0 until 60).map(j =>
      when(col(s"b$j") > 0, shiftleft(lit(1L), j)).otherwise(lit(0L)))
      .reduce(_.bitwiseOR(_))
    sums.select(col("doc_id"), assembled.as("simhash")).orderBy("doc_id")
  }

  /** SimHash near-dup candidates at Hamming radius <= 3, blocked the
    * Manku/Jain/Sarma (WWW'07) way: split the 60-bit signature into
    * `k` chunks and bucket on every (k-3)-chunk combination — a pair
    * within radius 3 touches <= 3 chunks, so by pigeonhole it agrees
    * on ALL chunks of at least one combination. k=4 is the single
    * 15-bit-chunk scheme; larger k trades replication (C(k,3) tables)
    * for longer bucket keys ((k-3)*60/k bits), which is what keeps the
    * bucket self-join's INPUT near-linear as the corpus grows — the 8x
    * probe showed 15-bit buckets birthday-colliding into 17.5M raw
    * pairs, and a fixed k re-creates that blowup at any fixed width.
    * k is picked from the corpus size (key bits ~ 2*log2(n) keeps
    * expected random collisions O(1) per table); the DuckDB oracle
    * derives k from count(*) with the same thresholds, so the blocking
    * replays exactly. Distance is exact (`bit_count(xor)`, codegen). */
  def simhashCandidates(spark: SparkSession, dir: String, maxHamming: Int = 3,
                        chunksOverride: Option[Int] = None): DataFrame = {
    val sig = simhash(spark, dir)
    // small -> 4 chunks (15-bit keys, 4 tables); mid -> 6 (30-bit keys,
    // 20 tables); huge -> 10 (42-bit keys, 120 tables). All divide 60.
    val n = Tables.documents(spark, dir).count()
    val k = chunksOverride.getOrElse(if (n < 8192L) 4 else if (n < (1L << 26)) 6 else 10)
    require(k > maxHamming, s"need more chunks ($k) than the radius ($maxHamming)")
    val w = 60 / k
    val mask = (1L << w) - 1
    def chunkCol(c: Int): Column = shiftright(col("simhash"), c * w).bitwiseAND(lit(mask))
    // every combination of k-3 chunks, as (combo id, packed key) structs;
    // the pack is an ascending-c left fold acc*2^w + chunk (<= 60 bits)
    val keyed = (0 until (1 << k)).filter(m => Integer.bitCount(m) == k - maxHamming).map { m =>
      val key = (0 until k).filter(c => ((m >> c) & 1) == 1)
        .map(chunkCol)
        .foldLeft(lit(0L): Column)((acc, ch) => acc * lit(1L << w) + ch)
      struct(lit(m).as("m"), key.as("key"))
    }
    val buckets = sig.select(col("doc_id"), col("simhash"), explode(array(keyed: _*)).as("mk"))
      .select(col("doc_id"), col("simhash"), col("mk.m").as("m"), col("mk.key").as("key"))
    buckets.as("x").join(buckets.as("y"),
        col("x.m") === col("y.m") && col("x.key") === col("y.key") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming) // radius the blocking guarantees
      .distinct()
      .orderBy("d1", "d2")
  }

  // ------------------------------------------------------------ analysis

  /** Per-language corpus statistics. */
  def langStats(spark: SparkSession, dir: String): DataFrame =
    tokenized(spark, dir)
      .withColumn("n_tokens", size(col("t")))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_chars")).as("total_chars"),
           min(col("n_chars")).as("min_chars"),
           max(col("n_chars")).as("max_chars"),
           sum(col("n_tokens")).as("total_tokens"))
      .withColumn("avg_tokens", round(col("total_tokens").cast("double") / col("n_docs"), 4))
      .orderBy("lang")

  /** Token counting two ways: whitespace and a BPE-ish word/punct
    * regex; plus distinct-token ratio (vocabulary richness). */
  def tokenStats(spark: SparkSession, dir: String): DataFrame =
    tokenized(spark, dir)
      .select(col("doc_id"),
              size(col("t")).cast("bigint").as("ws_tokens"),
              regexp_count(col("text"), lit("\\w+|[^\\w\\s]")).cast("bigint").as("re_tokens"),
              size(array_distinct(col("t"))).cast("bigint").as("distinct_tokens"))
      .withColumn("ttr", round(col("distinct_tokens").cast("double") / col("ws_tokens"), 4))
      .orderBy("doc_id")

  /** Term frequencies: global top-20 tokens with doc frequency. */
  def termStats(spark: SparkSession, dir: String): DataFrame =
    tokenized(spark, dir)
      .select(col("doc_id"), explode(col("t")).as("tok"))
      .groupBy("tok")
      .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
      .orderBy(col("tf").desc, col("tok").asc)
      .limit(20)

  /** Array functions over the token column: sort/dedup/slice/set ops —
    * the array-column surface (first 3 tokens, alphabetical first
    * token, overlap-with-stopwords count). */
  def arrayFns(spark: SparkSession, dir: String): DataFrame = {
    val stop = array(Seq("the", "a", "of", "and", "is", "to").map(lit): _*)
    tokenized(spark, dir)
      .select(col("doc_id"),
        concat_ws(" ", slice(col("t"), lit(1), lit(3))).as("first3"),
        element_at(array_sort(array_distinct(col("t"))), 1).as("alpha_first"),
        size(array_intersect(array_distinct(col("t")), stop)).cast("bigint").as("n_stop_kinds"),
        element_at(col("t"), -1).as("last_tok"))
      .orderBy("doc_id")
  }

  /** Document chunking: overlapping token windows (size 50, stride 40
    * = 10-token overlap) — the standard training-data prep shape. Pure
    * per-row expression work (sequence of starts -> posexplode), no
    * payload shuffle; at 100 TB this is a map-only stage. */
  def chunkDocs(spark: SparkSession, dir: String, size0: Int = 50, stride: Int = 40): DataFrame =
    tokenized(spark, dir)
      .withColumn("n", size(col("t")))
      .select(col("doc_id"), col("t"), col("n"),
        posexplode(sequence(lit(0), greatest(col("n") - 1, lit(0)), lit(stride))))
      .select(col("doc_id"),
        col("pos").cast("bigint").as("chunk_idx"),
        least(lit(size0), col("n") - col("col")).cast("bigint").as("n_chunk_tokens"),
        element_at(col("t"), col("col") + 1).as("first_tok"))
      .orderBy("doc_id", "chunk_idx")

  /** Higher-order-function predicates over the token array: exists /
    * forall / fold — per-row, shuffle-free. */
  def hofFns(spark: SparkSession, dir: String): DataFrame =
    tokenized(spark, dir)
      .select(col("doc_id"),
        exists(col("t"), x => length(x) > 10).as("has_long_tok"),
        forall(col("t"), x => length(x) >= 2).as("all_ge2"),
        aggregate(col("t"), lit(0L), (acc, x) => acc + length(x).cast("bigint"))
          .as("sum_tok_len"))
      .orderBy("doc_id")

  /** Text normalization: lowercase, strip punctuation, drop stopwords —
    * the standard pre-tokenization cleanup, map-only. Emits cleaned
    * token count + reconstructed head so the oracle can hash it. */
  def normalizeText(spark: SparkSession, dir: String): DataFrame = {
    val cleaned = split(
      trim(regexp_replace(lower(col("text")), "[^a-z0-9 ]", "")), " +")
    Tables.documents(spark, dir)
      .withColumn("ct", filter(cleaned,
        x => !x.isin("the", "a", "of", "and", "is", "to")))
      .select(col("doc_id"),
        size(col("ct")).cast("bigint").as("n_clean_tokens"),
        concat_ws(" ", slice(col("ct"), 1, 5)).as("head5"))
      .orderBy("doc_id")
  }

  /** PII scrubbing: mask email / phone-shaped spans, report match
    * counts — the compliance pass every training corpus needs. The
    * corpus is synthetic ASCII prose (expected zero hits) but the
    * operator is exercised end-to-end and oracle-checked. */
  def piiScrub(spark: SparkSession, dir: String): DataFrame = {
    val email = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
    val phone = "\\b\\d{3}[-.]\\d{3,4}[-.]\\d{4}\\b"
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        regexp_count(col("text"), lit(email)).cast("bigint").as("n_emails"),
        regexp_count(col("text"), lit(phone)).cast("bigint").as("n_phones"),
        md5(regexp_replace(regexp_replace(col("text"), email, "<EMAIL>"),
          phone, "<PHONE>")).as("scrubbed_fp"))
      .orderBy("doc_id")
  }

  /** TF-IDF: weight of each doc's top term — tf * ln(N/df), the
    * classic smooth-free form, deterministic via (weight desc, term
    * asc) tie-break. Two shuffles: df aggregation + per-doc ranking. */
  def tfidfTop(spark: SparkSession, dir: String): DataFrame = {
    val tok = tokenized(spark, dir).select(col("doc_id"), explode(col("t")).as("tok"))
    val n = Tables.documents(spark, dir).count() // tiny catalog count, driver-side
    val tf = tok.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val df = tok.select(col("doc_id"), col("tok")).distinct()
      .groupBy("tok").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
      .orderBy(col("w").desc, col("tok").asc)
    tf.join(df, "tok")
      .withColumn("w", round(col("tf") * log(lit(n.toDouble) / col("df")), 6))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("tok").as("top_term"), col("w").as("tfidf"))
      .orderBy("doc_id")
  }

  /** Language-ID heuristic: stopword-hit scoring against tiny per-lang
    * lexicons; argmax with a fixed tie-break order. (On this synthetic
    * corpus every lang shares one vocabulary — the operator's value is
    * its shape, which matches a real n-gram language IDer.) */
  def langIdHeuristic(spark: SparkSession, dir: String): DataFrame = {
    val lex = Map(
      "en" -> Seq("the", "a", "of", "and"),
      "de" -> Seq("der", "die", "das", "und"),
      "es" -> Seq("el", "la", "de", "y"),
      "fr" -> Seq("le", "la", "et", "de"),
      "zh" -> Seq("de", "shi", "le", "bu"))
    def score(words: Seq[String]): Column =
      words.map(w => size(filter(col("t"), x => x === w))).reduce(_ + _)
    val scored = tokenized(spark, dir)
      .withColumn("s_en", score(lex("en"))).withColumn("s_de", score(lex("de")))
      .withColumn("s_es", score(lex("es"))).withColumn("s_fr", score(lex("fr")))
      .withColumn("s_zh", score(lex("zh")))
    val best = greatest(col("s_en"), col("s_de"), col("s_es"), col("s_fr"), col("s_zh"))
    scored
      .withColumn("predicted",
        when(col("s_en") === best, "en").when(col("s_de") === best, "de")
          .when(col("s_es") === best, "es").when(col("s_fr") === best, "fr")
          .otherwise("zh"))
      .groupBy(col("lang"), col("predicted"))
      .agg(count(lit(1)).as("n"))
      .orderBy("lang", "predicted")
  }

  /** Quality scoring: length / punctuation / stopword / repetition
    * signals combined into one deterministic score. */
  def qualityScore(spark: SparkSession, dir: String): DataFrame = {
    val nTok = size(col("t")).cast("double")
    val stopHits = size(filter(col("t"), x =>
      x.isin("the", "a", "of", "and", "is", "to"))).cast("double")
    val punct = regexp_count(col("text"), lit("[^\\w\\s]")).cast("double")
    val ttr = size(array_distinct(col("t"))).cast("double") / nTok
    tokenized(spark, dir)
      .select(col("doc_id"),
        round(
          when(col("n_chars") >= 100 && col("n_chars") <= 1000, lit(1.0)).otherwise(lit(0.5)) *
          (lit(1.0) - least(punct / greatest(nTok, lit(1.0)), lit(1.0)) * 0.5) *
          (lit(0.5) + least(stopHits / greatest(nTok, lit(1.0)) * 2, lit(0.5))) *
          (lit(0.5) + ttr * 0.5), 4).as("quality"))
      .orderBy("doc_id")
  }

  /** Quality-score distribution: 0.1-wide bins over the (rounded)
    * per-doc quality — the corpus health report a filtering pipeline
    * thresholds against. Bins on the ROUNDED score, so edges are
    * engine-stable. */
  def qualityHistogram(spark: SparkSession, dir: String): DataFrame =
    qualityScore(spark, dir)
      .groupBy(floor(col("quality") * 10).cast("bigint").as("bin"))
      .agg(count(lit(1)).as("n_docs"),
        round(min(col("quality")), 4).as("lo"),
        round(max(col("quality")), 4).as("hi"))
      .orderBy("bin")
}
