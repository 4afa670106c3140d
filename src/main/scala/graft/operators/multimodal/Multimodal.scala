package graft.operators.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque binary payloads with typed metadata,
  * stub decode / feature extraction, and frame sampling.
  *
  * The container ships no image/audio codecs, so the decode step is a
  * clearly-marked deterministic STUB (md5-derived pseudo-features); the
  * Spark-side plumbing — binary columns, metadata structs, frame-range
  * generation, batch-friendly row-level expressions — is real and tested.
  * A production deployment swaps [[featureStub]] for a codec UDF or
  * mapInArrow/mapPartitions decoder with the same column contract.
  */
object Multimodal {

  /** Attach a binary payload + typed metadata struct. Here the blob is the
    * utf-8 text bytes (the corpus's stand-in for image/audio content).
    */
  def withBlob(df: DataFrame, content: Column, as: String = "blob"): DataFrame =
    df.withColumn(as, content.cast("binary"))
      .withColumn(s"${as}_meta", struct(
        octet_length(col(as)).as("n_bytes"),
        lit("text/plain").as("mime")))

  /** STUB feature extraction: `dims` pseudo-features in [0,1] derived from
    * md5 of the payload — deterministic, codegen'd, shaped like a decoder
    * output. Replace with a real decoder at deployment.
    */
  def featureStub(blob: Column, dims: Int = 4): Seq[Column] =
    (0 until dims).map { i =>
      (conv(substring(md5(blob), i * 4 + 1, 4), 16, 10).cast("long") / 65535.0)
        .as(s"f$i")
    }

  /** Real decoder extension point: a per-partition decode with a
    * pluggable `Array[Byte] => Seq[Double]` function — the shape a codec
    * UDF takes at deployment (decoder instantiated once per partition,
    * exactly where a native decoder's init cost belongs). The default
    * stub mirrors [[featureStub]]'s md5 features.
    */
  def decodePartitions(
      df: DataFrame,
      blobCol: String,
      dims: Int = 4)(
      decoder: Array[Byte] => Seq[Double] = Multimodal.stubDecoder(dims)): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(
      df.schema.fields :+ org.apache.spark.sql.types.StructField(
        "features", org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)))
    val idx = df.schema.fieldIndex(blobCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      // per-partition decoder instance (codecs are not serializable)
      val d = decoder
      rows.map { r =>
        val blob = r.getAs[Array[Byte]](idx)
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ d(blob))
      }
    }(enc)
  }

  /** Deterministic stand-in decoder: md5-derived pseudo-features. */
  def stubDecoder(dims: Int): Array[Byte] => Seq[Double] = { blob =>
    val h = java.security.MessageDigest.getInstance("MD5").digest(blob)
    (0 until dims).map { i =>
      val v = ((h(2 * i) & 0xff) << 8) | (h(2 * i + 1) & 0xff)
      v / 65535.0
    }
  }

  /** Frame sampling: every `every`-th frame of `frameSize` bytes, with the
    * frame payload and its digest. Generator expression — rows fan out per
    * input partition, no shuffle.
    */
  def frameSample(df: DataFrame, blob: String, frameSize: Int, every: Int): DataFrame =
    df.withColumn("frame_idx",
        explode(sequence(lit(0L),
          expr(s"CAST((octet_length($blob) - 1) div $frameSize AS BIGINT)"),
          lit(every.toLong))))
      .withColumn("frame",
        expr(s"substring($blob, frame_idx * $frameSize + 1, $frameSize)"))
      .withColumn("frame_md5", md5(col("frame")))

  /** Multimodal near-dup pairs by shared frame FINGERPRINTS — the
    * shot-level video/image dedup: two payloads pair when the Jaccard
    * of their sampled-frame digest SETS clears `threshold`. The frame
    * digest is the multimodal analogue of a shingle hash, so the shape
    * is exactly the text near-dup one: per-payload distinct digest
    * sets, a per-digest cap BEFORE the self-join (a degenerate frame —
    * black frames, silence — would otherwise explode the candidate
    * join), overlap counts, exact Jaccard on the counts.
    *
    * 100 TB shape: frame fan-out is a generator (no shuffle), the
    * digest self-join is equi-keyed and capped, the pair aggregate is
    * map-side-combinable; payload bytes never travel — only (id,
    * digest) rows do.
    */
  def nearDupPairs(df: DataFrame, blob: String, id: Column,
      frameSize: Int, every: Int, threshold: Double,
      maxPerHash: Int = 4096): DataFrame = {
    // scope-cache the distinct digest sets: the size aggregate and both
    // self-join sides derive from them — uncached, four parquet scans
    // re-running the frame fan-out (PlanAudit, round 16)
    graft.core.CacheScope.withPersisted(
      frameSample(df.select(id.as("doc_id"), col(blob)), blob,
        frameSize, every)
        .select(col("doc_id"), col("frame_md5")).distinct()) { fs =>
    val n = fs.groupBy(col("doc_id")).agg(count(lit(1)).as("_nf"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("frame_md5")).orderBy(col("doc_id"))
    val capped = fs.withColumn("_r", row_number().over(w))
      .filter(col("_r") <= maxPerHash).drop("_r")
    val inter = capped.select(col("frame_md5"), col("doc_id").as("a"))
      .join(capped.select(col("frame_md5").as("_h2"),
        col("doc_id").as("b")),
        col("frame_md5") === col("_h2") && col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("inter"))
    inter
      .join(n.select(col("doc_id").as("a"), col("_nf").as("_na")), Seq("a"))
      .join(n.select(col("doc_id").as("b"), col("_nf").as("_nb")), Seq("b"))
      .withColumn("jac", round(col("inter") * lit(1.0) /
        (col("_na") + col("_nb") - col("inter")), 6))
      .filter(col("jac") >= threshold)
      .select(col("a"), col("b"), col("inter").cast("int").as("inter"),
        col("jac"))
    }
  }

  /** Fixed-point DCT-II basis, `round(1024·cos((2x+1)uπ/16))` — the
    * 8×8 table is hardcoded (not computed) so both engines replay the
    * IDENTICAL integers: no libm in the data path, the LnNano rule.
    */
  private[graft] val DctT: Array[Array[Int]] = Array(
    Array(1024, 1024, 1024, 1024, 1024, 1024, 1024, 1024),
    Array(1004, 851, 569, 200, -200, -569, -851, -1004),
    Array(946, 392, -392, -946, -946, -392, 392, 946),
    Array(851, -200, -1004, -569, 569, 1004, 200, -851),
    Array(724, -724, -724, 724, 724, -724, -724, 724),
    Array(569, -1004, 200, 851, -851, -200, 1004, -569),
    Array(392, -946, 946, -392, -392, 946, -946, 392),
    Array(200, -569, 851, -1004, 1004, -851, 569, -200))

  /** 64-bit perceptual hash (pHash, the DCT form image dedup uses —
    * Zauner 2010): an 8×8 "luma" matrix per payload, 2-D integer DCT
    * against [[DctT]], bit p = u·8+v set when coefficient (u,v)
    * exceeds the median of the 63 AC coefficients. Unlike the frame-
    * digest Jaccard ([[nearDupPairs]]), pHash survives small payload
    * perturbations in DECODED space — the re-encoded/resized-image
    * dedup notion. The decode is the container's deterministic stub
    * (64 bytes from 4 chained md5s of the payload — [[featureStub]]'s
    * convention); a deployment swaps in a real 8×8 downsampled luma
    * with the same column contract, and everything downstream of the
    * luma array is real.
    *
    * Everything is exact integer arithmetic (|l·t·t| ≤ 2.7e8, 64-term
    * sums ≤ 1.7e10 — long-safe), so the hash is partition-order-exact
    * and the DuckDB oracle replays every coefficient bit-for-bit.
    *
    * 100 TB shape: the whole hash is ONE per-row native kernel
    * ([[graft.functions.PHash64]] — the [[graft.functions.CdcChunkRows]] remedy
    * applied to the former 64-cell fan-out + two basis joins + three
    * corpus-wide shuffles, 19.1 s → sub-second for the family at
    * sf0.1); zero shuffles, 8 bytes of per-doc state downstream. The
    * relational formulation survives as [[pHashViaJoins]], the spec
    * twin the DuckDB oracle replays and the unit suite pins equal.
    * Emits `(doc_id, phash)`.
    */
  def pHash(df: DataFrame, content: Column, id: Column): DataFrame =
    // spread the scan before the 4×md5 + pHash kernel (core.Scans —
    // the simhashDupPairs single-task-scan measurement)
    graft.core.Scans.spread(
        df.select(id.cast("long").as("doc_id"), content.as("_c")),
        col("doc_id"))
      .select(col("doc_id"),
        graft.functions.TextExpressions.pHash64(lumaHex(col("_c")))
          .as("phash"))

  /** The deterministic decode stub's 64-byte "luma" as a 128-hex-char
    * string: 4 chained md5s of the payload ([[featureStub]]'s
    * convention; a deployment swaps in a real 8×8 downsampled luma
    * with the same column contract).
    */
  private def lumaHex(content: Column): Column =
    concat(md5(content.cast("binary")),
      md5(concat(content, lit("1")).cast("binary")),
      md5(concat(content, lit("2")).cast("binary")),
      md5(concat(content, lit("3")).cast("binary")))

  /** The relational pHash formulation — [[pHash]]'s spec twin, the
    * exact chain the DuckDB oracle replays (64-cell generator fan-out,
    * two broadcast joins against the [[DctT]] basis, (doc, u, v) sum,
    * rank-32 AC median, bit sum). Kept non-private for the LlmSpec
    * native≡relational corpus pin (the shinglesFromTokensHof
    * convention); production callers use the native kernel.
    */
  private[graft] def pHashViaJoins(
      df: DataFrame, content: Column, id: Column): DataFrame = {
    val sp = df.sparkSession
    import sp.implicits._
    val lumaArr = array((0 until 64).map(p =>
      conv(substring(col("_hex"), 2 * p + 1, 2), 16, 10)
        .cast("long")): _*)
    val cells = df
      .select(id.cast("long").as("doc_id"), lumaHex(content).as("_hex"))
      .select(col("doc_id"), posexplode(lumaArr).as(Seq("p", "l")))
      .select(col("doc_id"), expr("p div 8").as("x"),
        (col("p") % 8).as("y"), col("l"))
    val tU = broadcast((for {u <- 0 until 8; x <- 0 until 8}
      yield (u, x, DctT(u)(x).toLong)).toDF("u", "x", "tux"))
    val tV = broadcast((for {v <- 0 until 8; y <- 0 until 8}
      yield (v, y, DctT(v)(y).toLong)).toDF("v", "y", "tvy"))
    val coef = cells.join(tU, "x").join(tV, "y")
      .groupBy(col("doc_id"), col("u"), col("v"))
      .agg(sum(col("l") * col("tux") * col("tvy")).as("c"))
    val med = coef.filter(!(col("u") === 0 && col("v") === 0))
      .groupBy(col("doc_id"))
      // 32nd smallest of the 63 AC coefficients: a bounded 63-element
      // per-doc sort, exact under any partitioning
      .agg(element_at(array_sort(collect_list(col("c"))), 32).as("med"))
    coef.join(med, Seq("doc_id"))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("c") > col("med"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(u * 8 + v AS INT))"))
        .otherwise(0L)).as("phash"))
  }

  /** Haitsma–Kalker audio sub-fingerprint stream (the Philips robust
    * hash, Haitsma & Kalker 2002 — the canonical broadcast-monitoring
    * audio dedup): the payload decodes to a 16-bit sample series (the
    * deterministic stub: md5-60-bit token hash mod 2¹⁶ per whitespace
    * token — a deployment swaps a real PCM decoder with the same
    * `(doc_id, samples)` contract), samples frame into 50%-overlapped
    * windows of 34 (hop 17), each frame yields 17 band energies
    * (Σ s² over 2 samples per band — the stub's stand-in for the
    * filterbank), and sub-fingerprint bit m is set when the
    * band-energy delta `(E(n,m)−E(n,m+1)) − (E(n−1,m)−E(n−1,m+1))`
    * is positive — HK's sign rule, scaled 33 bands/32 bits → 17/16.
    * Unlike [[nearDupPairs]]'s frame-md5 digests (any byte flip
    * avalanches), the sub-fingerprint tracks DECODED band energies —
    * the re-encoded/resampled-audio dedup notion, [[pHash]]'s
    * robustness story on the time axis.
    *
    * 100 TB shape: the whole stream is ONE per-row native kernel
    * ([[graft.functions.HkAudioFp]] — the CdcChunkRows pattern), a
    * generator fan-out, zero shuffles; ~2 int columns per frame
    * downstream. All-integer math (E < 2³³), so the DuckDB oracle
    * replays every band energy and bit. Emits
    * `(doc_id, frame_idx ≥ 1, fp)`; docs under 51 tokens emit nothing.
    */
  def audioFp(df: DataFrame, content: Column, id: Column): DataFrame =
    df.select(id.cast("long").as("doc_id"),
        explode(graft.functions.TextExpressions.hkAudioFp(content)).as("_f"))
      .select(col("doc_id"), col("_f.frame_idx").as("frame_idx"),
        col("_f.fp").as("fp"))

  /** The relational/HOF audio-fp formulation — [[audioFp]]'s spec twin,
    * the exact chain the DuckDB oracle replays (token-hash samples,
    * frame sequence, aggregate over the 16 band-delta sign bits). Kept
    * non-private for the LlmSpec native≡relational corpus pin (the
    * pHashViaJoins convention); production callers use the kernel.
    */
  private[graft] def audioFpViaHof(
      df: DataFrame, content: Column, id: Column): DataFrame = {
    // try_element_at: the floor-of-one-frame trick below evaluates the
    // fp expression for fi = 1 even on docs too short to have it (the
    // row is sliced away) — ANSI element_at would throw on the
    // out-of-range probe; null here folds to bit 0 and is discarded
    def eT(a: String, m: String): String =
      s"(try_element_at(_s, ($a)*17 + 2*($m) + 1) * " +
        s"try_element_at(_s, ($a)*17 + 2*($m) + 1) + " +
        s"try_element_at(_s, ($a)*17 + 2*($m) + 2) * " +
        s"try_element_at(_s, ($a)*17 + 2*($m) + 2))"
    val diff = s"((${eT("fi", "m")} - ${eT("fi", "m + 1")}) - " +
      s"(${eT("fi - 1", "m")} - ${eT("fi - 1", "m + 1")}))"
    df.select(id.cast("long").as("doc_id"), content.as("_t"))
      .withColumn("_s", expr(
        "transform(split(trim(_t), '\\\\s+'), t -> " +
          "CAST(conv(substring(md5(t), 1, 15), 16, 10) AS BIGINT) % 65536)"))
      .withColumn("_nf", expr(
        "CAST(CASE WHEN size(_s) >= 34 THEN (size(_s) - 34) div 17 + 1 " +
          "ELSE 0 END AS INT)"))
      // sequence(1, 0) would DESCEND in Spark, so build over a floor of
      // one frame and slice to the true count (empty when _nf < 2);
      // out-of-range element_at is null inside the sliced-away frames
      .withColumn("_fr", expr(
        "slice(transform(sequence(1, greatest(_nf - 1, 1)), fi -> " +
          "named_struct('frame_idx', CAST(fi AS INT), 'fp', " +
          s"aggregate(sequence(0, 15), 0, (acc, m) -> " +
          s"acc + IF($diff > 0, shiftleft(1, m), 0)))), " +
          "1, greatest(_nf - 1, 0))"))
      .select(col("doc_id"), explode(col("_fr")).as("_f"))
      .select(col("doc_id"), col("_f.frame_idx").as("frame_idx"),
        col("_f.fp").as("fp"))
  }

  /** Audio near-dup pairs by shared sub-fingerprint VALUES — the HK
    * lookup-table search re-expressed relationally: two payloads pair
    * when the Jaccard of their distinct sub-fingerprint sets clears
    * `threshold`. Same machinery as [[nearDupPairs]] (per-payload
    * distinct sets, per-value cap BEFORE the self-join, overlap
    * counts, exact Jaccard) — the difference is WHAT matches: robust
    * band-energy fingerprints instead of avalanche digests, so
    * re-encoded copies still collide. 16-bit fp values mean singleton
    * birthday collisions across unrelated docs are expected — the
    * Jaccard threshold (not the raw match) is the dedup signal.
    *
    * 100 TB shape: kernel fan-out (no shuffle) → distinct → capped
    * equi-join → map-side-combinable count; payload bytes never
    * travel. Emits `(a, b, inter, jac)`.
    */
  def audioFpPairs(df: DataFrame, content: Column, id: Column,
      threshold: Double = 0.2, maxPerFp: Int = 4096): DataFrame = {
    graft.core.CacheScope.withPersisted(
      audioFp(df.select(id.as("_id0"), content.as("_c")),
        col("_c"), col("_id0"))
        .select(col("doc_id"), col("fp")).distinct()) { fs =>
      val n = fs.groupBy(col("doc_id")).agg(count(lit(1)).as("_nf"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("fp")).orderBy(col("doc_id"))
      val capped = fs.withColumn("_r", row_number().over(w))
        .filter(col("_r") <= maxPerFp).drop("_r")
      val inter = capped.select(col("fp"), col("doc_id").as("a"))
        .join(capped.select(col("fp").as("_h2"), col("doc_id").as("b")),
          col("fp") === col("_h2") && col("a") < col("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("inter"))
      inter
        .join(n.select(col("doc_id").as("a"), col("_nf").as("_na")), Seq("a"))
        .join(n.select(col("doc_id").as("b"), col("_nf").as("_nb")), Seq("b"))
        .withColumn("jac", round(col("inter") * lit(1.0) /
          (col("_na") + col("_nb") - col("inter")), 6))
        .filter(col("jac") >= threshold)
        .select(col("a"), col("b"), col("inter").cast("int").as("inter"),
          col("jac"))
    }
  }

  /** Offset-aligned audio matching — the Haitsma–Kalker SEARCH step on
    * top of [[audioFp]]: a clip embedded in another (or re-cut with a
    * shifted start) shares sub-fingerprints at a CONSISTENT frame-index
    * delta, so the best alignment is the mode of
    * `frame_idx_a − frame_idx_b` over matching fp values, and the vote
    * count at that offset is the match strength. A 17-token (one-hop)
    * prefix shifts every subsequent frame by exactly one index and
    * leaves the body fingerprints intact — set-Jaccard
    * ([[audioFpPairs]]) dilutes under such cuts while the aligned count
    * does not; this is the shift-robustness the HK scheme exists for.
    *
    * Ties on the vote count break to the SMALLEST signed offset
    * (deterministic under any partitioning). Emits
    * `(a, b, offset, n_aligned)` for pairs with
    * `n_aligned ≥ minAligned`.
    *
    * 100 TB shape: kernel fan-out (no shuffle) → per-fp-value cap
    * BEFORE the inverted-index equi-join (the audioFpPairs rule) →
    * map-side-combinable (a, b, offset) count → ONE window rank
    * partitioned by (a, b). Payload bytes never travel.
    */
  def audioFpAlignPairs(df: DataFrame, content: Column, id: Column,
      minAligned: Int = 2, maxPerFp: Int = 4096): DataFrame = {
    graft.core.CacheScope.withPersisted(
      audioFp(df.select(id.as("_id0"), content.as("_c")),
        col("_c"), col("_id0"))) { fs =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("fp")).orderBy(col("doc_id"), col("frame_idx"))
      val capped = fs.withColumn("_r", row_number().over(w))
        .filter(col("_r") <= maxPerFp).drop("_r")
      val l = capped.select(col("fp"), col("doc_id").as("a"),
        col("frame_idx").as("_fa"))
      val r = capped.select(col("fp").as("_h2"), col("doc_id").as("b"),
        col("frame_idx").as("_fb"))
      val votes = l.join(r, col("fp") === col("_h2") && col("a") < col("b"))
        .groupBy(col("a"), col("b"),
          (col("_fa") - col("_fb")).as("offset"))
        .agg(count(lit(1)).as("n_aligned"))
      val rank = org.apache.spark.sql.expressions.Window
        .partitionBy(col("a"), col("b"))
        .orderBy(col("n_aligned").desc, col("offset"))
      votes.withColumn("_rn", row_number().over(rank))
        .filter(col("_rn") === 1 && col("n_aligned") >= minAligned)
        .select(col("a"), col("b"), col("offset").cast("int").as("offset"),
          col("n_aligned"))
    }
  }

  /** pHash near-dup pairs by 16-bit band blocking — the
    * [[graft.operators.text.Dedup.simhashDupPairs]] machinery on the
    * 64-bit perceptual hash: 4 bands of 16 bits give the pigeonhole
    * guarantee (≤ 3 differing bits cannot touch all 4 bands, so every
    * qualifying pair shares one EXACT band — deterministic recall up
    * to the bucket cap). Verify = one popcount per candidate.
    * Emits `(a, b, hamming)`.
    */
  def pHashPairs(df: DataFrame, content: Column, id: Column,
      maxHamming: Int = 3, maxBucketSize: Int = 4096): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"pHashPairs: maxHamming in [0, 3] (the 4-band pigeonhole " +
        s"recall guarantee), got $maxHamming")
    graft.core.CacheScope.withPersisted(pHash(df, content, id)) { h =>
      val banded = h.select(col("doc_id"), col("phash"),
          explode(array((0 until 4).map(i =>
            struct(lit(i).as("band"),
              expr(s"shiftright(phash, ${16 * i}) & 65535")
                .as("key"))): _*)).as("_e"))
        .select(col("doc_id"), col("phash"),
          col("_e.band").as("band"), col("_e.key").as("key"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("band"), col("key")).orderBy(col("doc_id"))
      // N-pinned repartition before the quadratic pair stage — the
      // Dedup.simhashDupPairs AQE-coalescing rule
      val spreadB = banded.repartition(
        df.sparkSession.sparkContext.defaultParallelism,
        col("band"), col("key"))
      val capped = spreadB.withColumn("_r", row_number().over(w))
        .filter(col("_r") <= maxBucketSize).drop("_r")
      val l = capped.select(col("band"), col("key"),
        col("doc_id").as("a"), col("phash").as("ph_a"))
      val r = capped.select(col("band").as("band_r"),
        col("key").as("key_r"), col("doc_id").as("b"),
        col("phash").as("ph_b"))
      l.join(r, col("band") === col("band_r") &&
          col("key") === col("key_r") && col("a") < col("b"))
        .select(col("a"), col("b"),
          bit_count(col("ph_a").bitwiseXOR(col("ph_b")))
            .cast("int").as("hamming"))
        // filter BEFORE the dedup: hamming > maxHamming candidates are
        // dropped either way, so the distinct's shuffle carries only
        // survivors (filter-then-distinct == distinct-then-filter on a
        // value predicate; guide §2.3 shuffle-fewer-bytes)
        .filter(col("hamming") <= maxHamming)
        .distinct() // a close pair shares SEVERAL bands — one row
    }
  }
}
