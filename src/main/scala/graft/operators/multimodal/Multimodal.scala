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
}
