package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads ride as
  * opaque `binary` columns with typed metadata alongside. The
  * Spark-side contract (schema, batching, partitioning) is real and
  * tested; the codec itself is a pluggable `BinaryDecoder`, stubbed
  * deterministically here because no media libraries ship in this
  * environment.
  *
  * Scale posture: payload bytes never enter a shuffle — decode /
  * feature-extract are mapPartitions-shaped (the Scala analog of
  * `mapInPandas` batches), metadata-only results are the things that
  * aggregate. Frame sampling multiplies rows map-side only.
  */
object Multimodal {

  /** A decoded frame: dimensions + a small feature payload. */
  final case class Frame(width: Int, height: Int, format: String,
      features: Array[Float])

  /** The codec seam. A production build plugs an image/audio codec
    * in here; everything around it is engine code that does not
    * change. */
  trait BinaryDecoder extends Serializable {
    def decode(bytes: Array[Byte]): Frame
  }

  /** Deterministic fake codec: derives dimensions and features from
    * the bytes themselves so tests are reproducible. A real decoder
    * would be the only line that changes. */
  object StubDecoder extends BinaryDecoder {
    def decode(bytes: Array[Byte]): Frame = {
      val n = bytes.length
      val w = 64 + (math.abs(if (n == 0) 0 else bytes(0).toInt) % 192)
      val h = 64 + (math.abs(if (n < 2) 0 else bytes(1).toInt) % 192)
      val feats = Array.tabulate(8)(i =>
        (if (n == 0) 0f else bytes(i % n).toFloat) / 128f)
      Frame(w, h, "stub", feats)
    }
  }

  final case class BinaryRecord(id: Long, payload: Array[Byte], kind: String)
  final case class DecodedRecord(id: Long, kind: String, n_bytes: Int,
      width: Int, height: Int, format: String, features: Array[Float])

  /** Decode a binary-column Dataset in partition-sized batches —
    * the payload stays executor-local; only the (small) decoded
    * metadata continues down the pipeline. */
  def decodeBatch(ds: Dataset[BinaryRecord], decoder: BinaryDecoder): Dataset[DecodedRecord] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { r =>
        val f = decoder.decode(r.payload)
        DecodedRecord(r.id, r.kind, r.payload.length, f.width, f.height,
          f.format, f.features)
      }
    }
  }

  /** Frame sampling: every `stride`-th frame index up to `maxFrames`
    * per record — row multiplication happens map-side (explode), no
    * shuffle, so a video table fans out without moving payloads. */
  def sampleFrames(df: DataFrame, nFramesCol: String, stride: Int,
      maxFrames: Int): DataFrame =
    df.withColumn("frame_idx",
      explode(sequence(lit(0),
        least(col(nFramesCol) - 1, lit((maxFrames - 1) * stride)), lit(stride))))

  /** 60-bit block perceptual hash of a binary payload (blockhash-style:
    * fixed threshold per sampled position, no mean/median coupling —
    * perturbing one byte flips at most the bits that sample it, which
    * is what makes Hamming distance track payload similarity). Bit j
    * reads the byte at position ⌊j·n/60⌋; j·n ≤ ~10⁹ is exact in the
    * double division, so the position math is engine-stable. 60 bits
    * keeps the hash positive in a signed 64-bit long on any engine.
    * A real image pHash (DCT of decoded pixels) plugs in through the
    * same BinaryDecoder seam; the banding/joining downstream is
    * codec-independent. */
  def blockHash60(payload: Column): Column = {
    val s = payload.cast("string")
    // LONG multiply (r15 advice): int j·n overflows past ~2^31/60
    // chars (~36M — multi-MB payloads are plausible at 100 TB, and
    // ANSI mode turns the wrap into a throw); j·n ≤ 60·2^31 is exact
    // in the double division, so positions (and hashes) are
    // bit-identical to the int form wherever it didn't overflow
    val n = length(s).cast("long")
    (0 until 60).map { j =>
      when(ascii(s.substr(floor(lit(j.toLong) * n / 60.0).cast("int") + 1, lit(1))) > 96,
        lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** WIDTH-GENERIC block hash — the 100-TB knob the blockHash60
    * scaladoc promises ("widen the HASH, not the blocking"), as code
    * since r15 (the r14 verdict's item 6). `bits` must be a multiple
    * of 60; the hash rides as array<long> of bits/60 words, word w
    * holding FULL-hash bits [60w, 60w+60) in its low 60 bits. Bit j
    * of the full hash reads the byte at ⌊j·n/bits⌋ with the same
    * fixed threshold as blockHash60, so blockHash(p, 60)[0] IS
    * blockHash60(p) bit-for-bit (spec-pinned). Wider bits → more
    * sampled positions → sparser pigeonhole buckets downstream
    * (density n/2^chunkBits per chunk) — the knob that keeps
    * candidate volume flat as the corpus grows 100×. */
  def blockHash(payload: Column, bits: Int): Column = {
    require(bits >= 60 && bits % 60 == 0,
      s"bits must be a positive multiple of 60, got $bits")
    val s = payload.cast("string")
    // LONG multiply — same overflow guard as blockHash60
    val n = length(s).cast("long")
    array((0 until bits / 60).map { w =>
      (0 until 60).map { b =>
        val j = w * 60 + b
        when(ascii(s.substr(
            floor(lit(j.toLong) * n / bits.toDouble).cast("int") + 1, lit(1))) > 96,
          lit(1L << b)).otherwise(lit(0L))
      }.reduce(_ + _)
    }: _*)
  }

  /** Near-duplicate payload pairs by perceptual-hash Hamming distance
    * ≤ maxHamming — the multimodal twin of d4's SimHash dedup, same
    * pigeonhole scheme: split the 60-bit hash into maxHamming+1
    * chunks; two hashes within the bound agree EXACTLY on at least
    * one chunk, so candidates come from an equi-join on (chunk_idx,
    * chunk_val) — never an all-pairs scan — and the exact bit_count
    * filter runs only on bucket collisions.
    *
    * Scale knob: bucket density is n / 2^chunkBits per chunk, so at
    * 100 TB widen the HASH, not the corpus blocking — a 120-bit
    * [[blockHash]] with maxHamming=5 gives 20-bit chunks (1M buckets
    * each) through [[phashNearDupPairsWide]], the same banding over
    * the array<long> word form; the soak meters candidate volume at
    * 60 vs 120 bits on the replica corpus. */
  def phashNearDupPairs(hashed: DataFrame, idCol: String, hashCol: String,
      maxHamming: Int, maxBucket: Option[Int] = None): DataFrame = {
    require(maxHamming >= 0 && 60 % (maxHamming + 1) == 0,
      s"maxHamming+1 must divide 60, got $maxHamming")
    val nChunks = maxHamming + 1
    val bits = 60 / nChunks
    // shuffle_hash, deliberately (the d4 rule, r15): both self-join
    // sides are this corpus-proportional chunk frame — a broadcast is
    // a small-corpus artifact that double-computes the hash fan-out;
    // the hinted shuffle join is the at-scale plan (m5 2.1 → faster
    // measured on the switch), and AQE's exchange reuse collapses the
    // two identical sides to one map stage (PlanAuditSpec asserts
    // ReusedExchange). maxBucket engages the d4 bucket-skew guard
    // (graft.dedup.SimHash.capBuckets — metered-recall drop of
    // saturated (chunk_idx, chunk_val) buckets; off for the oracled
    // m5, the 100-TB knob for boilerplate-saturated media corpora).
    val chunks0 = hashed.select(col(idCol).as("id"), col(hashCol).as("ph"),
      posexplode(array((0 until nChunks).map(c =>
        shiftrightunsigned(col(hashCol), c * bits)
          .bitwiseAND(lit((1L << bits) - 1))): _*)).as(Seq("chunk_idx", "chunk_val")))
    val chunks = maxBucket.fold(chunks0)(graft.dedup.SimHash
        .capBuckets(chunks0, _, Seq("chunk_idx", "chunk_val")))
      .hint("shuffle_hash")
    chunks.as("a").join(chunks.as("b"),
        col("a.chunk_idx") === col("b.chunk_idx") &&
          col("a.chunk_val") === col("b.chunk_val") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"),
        bit_count(col("a.ph").bitwiseXOR(col("b.ph"))).cast("int").as("hamming"))
      // filter BEFORE distinct: hamming is a pure function of the
      // pair, so the two orders are equivalent — dropping failed
      // candidates map-side keeps the distinct's shuffle at
      // matched-pair volume instead of chunk-collision-candidate
      // volume
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** (id, ph, chunk_idx, chunk_val) fan-out for the WIDE hash — the
    * pigeonhole front of [[phashNearDupPairsWide]], exposed so the
    * soak can meter raw candidate volume (the pre-filter join size
    * the width knob exists to shrink). Chunk c covers full-hash bits
    * [c·chunkBits, (c+1)·chunkBits); a chunk spanning two 60-bit
    * words is reassembled with two shifts and a mask. */
  private[graft] def phashChunksWide(hashed: DataFrame, idCol: String,
      hashCol: String, bits: Int, maxHamming: Int): DataFrame = {
    require(bits >= 60 && bits % 60 == 0,
      s"bits must be a positive multiple of 60, got $bits")
    val nChunks = maxHamming + 1
    require(maxHamming >= 0 && bits % nChunks == 0,
      s"maxHamming+1 must divide bits=$bits, got $maxHamming")
    val chunkBits = bits / nChunks
    require(chunkBits <= 60, s"chunk width $chunkBits exceeds a word")
    val mask = if (chunkBits == 60) (1L << 60) - 1 else (1L << chunkBits) - 1
    def chunkVal(ph: Column, c: Int): Column = {
      val lo = c * chunkBits
      val hi = (c + 1) * chunkBits - 1
      val wlo = lo / 60
      val off = lo % 60
      if (hi / 60 == wlo)
        shiftrightunsigned(element_at(ph, wlo + 1), off).bitwiseAND(lit(mask))
      else
        // spans two words: low 60-off bits from word wlo, the rest
        // from the next word's low bits; over-shifted garbage dies
        // in the mask
        shiftrightunsigned(element_at(ph, wlo + 1), off)
          .bitwiseOR(shiftleft(element_at(ph, wlo + 2), 60 - off))
          .bitwiseAND(lit(mask))
    }
    hashed.select(col(idCol).as("id"), col(hashCol).as("ph"),
      posexplode(array((0 until nChunks).map(chunkVal(col(hashCol), _)): _*))
        .as(Seq("chunk_idx", "chunk_val")))
  }

  /** [[phashNearDupPairs]] for the width-generic array<long> hash
    * (same pigeonhole guarantee: within-bound pairs agree exactly on
    * ≥1 chunk). Hamming over the word array is a light per-element
    * HOF (2 words at 120-bit) — the r6-measured fast shape. */
  def phashNearDupPairsWide(hashed: DataFrame, idCol: String, hashCol: String,
      bits: Int, maxHamming: Int, maxBucket: Option[Int] = None): DataFrame = {
    val chunks0 = phashChunksWide(hashed, idCol, hashCol, bits, maxHamming)
    val chunks = maxBucket.fold(chunks0)(graft.dedup.SimHash
        .capBuckets(chunks0, _, Seq("chunk_idx", "chunk_val")))
      .hint("shuffle_hash")
    chunks.as("a").join(chunks.as("b"),
        col("a.chunk_idx") === col("b.chunk_idx") &&
          col("a.chunk_val") === col("b.chunk_val") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"),
        aggregate(zip_with(col("a.ph"), col("b.ph"),
            (x, y) => bit_count(x.bitwiseXOR(y))),
          lit(0), (s, v) => s + v).cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Audio activity segmentation over opaque payloads (the ASR-data
    * preparation rung: split a recording into voiced segments before
    * transcription/packing; m4's frame idea applied to the energy
    * domain). The payload is read as fixed `windowBytes` windows
    * (complete windows only — a trailing partial window is below the
    * detector's resolution), each window's ENERGY is the exact
    * integer sum of its byte values (the fixture corpus is ASCII, so
    * ascii(char) IS the payload byte — m3's contract; a real PCM
    * energy/VAD score plugs in through the same seam), and maximal
    * runs of consecutive windows with energy ≥ `threshold` merge
    * into segments (the classic islands step: run id = window index
    * − per-doc row_number, constant exactly on consecutive runs).
    *
    * Scale shape: the window fan-out is map-side (payloads never
    * shuffle — only (doc_id, window, energy) triples do); the islands
    * window, the run aggregation and the per-doc segment numbering
    * all key on doc_id, so ONE doc-keyed exchange serves all three
    * (hashPartitioning(doc_id) satisfies the (doc_id, run) clustering
    * — a subset of the agg keys). All-integer output. */
  def audioSegments(df: DataFrame, idCol: String, payloadCol: String,
      windowBytes: Int, threshold: Long): DataFrame = {
    // `pl` is projected to an attribute before the lambda touches it
    // (the x25 outer-expression rule); the per-window substring +
    // 50-byte ascii fold are the LIGHT per-element probes the r6
    // measurements favor as HOFs
    val wins = df
      .select(col(idCol).as("doc_id"), col(payloadCol).cast("string").as("pl"))
      .filter(length(col("pl")) >= windowBytes)
      .select(col("doc_id"),
        posexplode(expr(
          s"transform(sequence(0, CAST(length(pl) DIV $windowBytes AS INT) - 1)," +
            s" w -> substring(pl, w * $windowBytes + 1, $windowBytes))"))
          .as(Seq("w", "win")))
      .select(col("doc_id"), col("w"),
        expr("aggregate(split(win, ''), 0, (a, c) -> a + ascii(c))")
          .cast("long").as("energy"))
    val order = Window.partitionBy("doc_id").orderBy("w")
    val runs = wins.filter(col("energy") >= threshold)
      .withColumn("run", col("w") - row_number().over(order))
    val segs = runs.groupBy("doc_id", "run")
      .agg(min(col("w")).cast("long").as("start_window"),
        count(lit(1)).as("n_windows"),
        sum(col("energy")).as("energy_total"))
    val segOrder = Window.partitionBy("doc_id").orderBy("start_window")
    segs.withColumn("seg_idx", row_number().over(segOrder))
      .select(col("doc_id"), col("seg_idx"), col("start_window"),
        col("n_windows"), col("energy_total"))
  }

  /** Binary metadata extraction (the oracled m1 surface): size,
    * magic prefix, content hash — pure expressions over the payload. */
  def binaryMeta(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(col(idCol),
      length(col(payloadCol)).as("n_bytes"),
      substring(col(payloadCol).cast("string"), 1, 4).as("magic"),
      md5(col(payloadCol)).as("content_md5"))
}
