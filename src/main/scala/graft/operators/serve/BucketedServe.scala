package graft.operators.serve

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.text.TextOps
import graft.operators.vector.VectorOps

/** Bucketed serving indices — the "materialized view" half of the
  * retrieval story made EXECUTABLE.
  *
  * `TextOps.bm25Retrieve` and `VectorOps.annVsIndex` both document the
  * 100 TB serving shape as prose: "write the index bucketed by the
  * probe key and the probe equi-join co-locates". This module is that
  * claim as code: the index table is WRITTEN with `bucketBy(probeKey)`
  * to a real parquet path (Spark records the bucket spec in the
  * catalog; each bucket file holds exactly the rows whose
  * `hash(key) % buckets` lands there), re-READ through the catalog,
  * and the probe join then needs NO Exchange on the index side — the
  * scan itself satisfies the join's distribution requirement.
  * `BucketedServeSpec` asserts that plan property mechanically
  * (SortMergeJoin with zero ShuffleExchange between the join and the
  * bucketed scan, broadcast disabled so the assert can't be
  * trivially satisfied), and the `text_bm25_serve_bucketed` /
  * `emb_vs_bucketed_index` oracle rows pin that the round-tripped
  * artifact serves bit-identical results.
  *
  * At 100 TB the index build is the offline batch job (one shuffle to
  * bucket the postings / cells); every subsequent probe batch pays
  * only ITS OWN side's shuffle into the bucket count. Reference
  * analog: the materialized-view role of `esp_collect`
  * (`esp_collect.erl:63` — a queryable held table that streams probe
  * against), re-expressed as a bucketed parquet artifact + catalog
  * entry instead of a held actor table.
  *
  * Scoring arithmetic is IDENTICAL to the non-bucketed serve paths
  * (`bm25Retrieve`'s exact fixed-point Okapi; `annVsIndex`'s exact
  * cosine threshold), so both queries share their existing oracles.
  */
object BucketedServe {

  /** Deterministic scratch path per index artifact, namespaced by the
    * Spark APPLICATION id: repeated executions within one app (a bench
    * run re-executes each bucketed query up to four times — warm-up +
    * three passes) OVERWRITE one location instead of accumulating
    * per-run temp copies, while two concurrent JVMs (a Verify and a
    * Bench on the same machine) can never half-overwrite each other's
    * index mid-probe — each app owns its own directory. The
    * overwrite-mode `saveAsTable` below replaces both the catalog
    * entry and the path contents, so intra-app reuse is safe under
    * the engine's sequential execution model.
    */
  def scratchPath(tableName: String): String = {
    val app = try SparkSession.active.sparkContext.applicationId
      catch { case _: Throwable => "noapp" }
    val d = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_serve_idx",
      app, tableName)
    java.nio.file.Files.createDirectories(d)
    d.toString
  }

  /** Bucket-count law for the serving artifacts — the occupancy
    * discipline of `simhash64AutoBandBits` applied to the co-location
    * story's load-bearing knob: too few buckets = giant bucket files
    * (a bucket is ONE task's read unit on the index side — it bounds
    * probe parallelism and memory), too many = a small-file storm and
    * per-bucket overhead. The law: smallest power of two with at most
    * `targetRowsPerBucket` rows per bucket, clamped to [8, 65536].
    * The 4 Mi-row default targets ~100–200 MB bucket files at the
    * posting/cell row widths (the HDFS-block sweet spot); the floor
    * keeps small corpora at the historical 8; the ceiling caps
    * file-count blowup — past it, grow `targetRowsPerBucket` or shard
    * the artifact. Pure integer arithmetic (the ADVICE r14 rule: no
    * float log at exact powers of two). `buckets = 0` on every write
    * path routes here from ONE count job.
    */
  def autoBuckets(rows: Long,
      targetRowsPerBucket: Long = 4L << 20): Int = {
    require(targetRowsPerBucket >= 1,
      s"autoBuckets: targetRowsPerBucket >= 1, got $targetRowsPerBucket")
    val want = math.max(1L,
      (math.max(rows, 0L) + targetRowsPerBucket - 1L) / targetRowsPerBucket)
    val p2 = if (want <= 1L) 1L
      else java.lang.Long.highestOneBit(want - 1L) << 1
    math.min(65536L, math.max(8L, p2)).toInt
  }

  /** `buckets = 0` means "apply the [[autoBuckets]] law to `rows`". */
  private[serve] def resolveBuckets(buckets: Int, rows: => Long): Int =
    if (buckets == 0) autoBuckets(rows) else buckets

  /** Align rows to ONE partition per bucket before a bucketed write
    * (guide §6 output sizing): Spark's bucket-file assignment is
    * `pmod(murmur3(bucketCols), n)` — the SAME law as a hash
    * repartition on the bucket columns — so this yields exactly `n`
    * write tasks, each writing its single bucket file. Without it a
    * P-partition input writes up to P×n files: every write task opens
    * a parquet writer per bucket it sees (measured 6.7 s of write CPU
    * + a 256-file probe scan on text_bm25_serve from a 32-partition
    * posting frame), and at 100 TB the same fan-out is the classic
    * small-file storm. The repartition replaces the input's
    * partitioning with the write's own, so it adds no net exchange
    * where the input was about to shuffle anyway.
    */
  private[serve] def bucketAligned(rows: DataFrame, n: Int,
      bucketCols: Seq[String]): DataFrame =
    rows.repartition(n, bucketCols.map(col): _*)

  /** Build and WRITE the BM25 posting index, bucketed + sorted by
    * `tok`. The stored row is DENORMALIZED — `(tok, doc_id, tf, dl,
    * idf_nano)` — so a probe touches exactly one table (the idf join
    * is paid once at build time, not per query batch). Corpus stats
    * the Okapi term needs at probe time (`S` total tokens, `N` docs,
    * `max_dl` for the overflow guard) land beside the table as a
    * 1-row parquet at `<path>/stats`.
    *
    * Same build semantics as [[TextOps.bm25Retrieve]]: idf from the
    * UNCAPPED df table (a capped df would misstate rarity), the
    * per-token posting cap applied after — the documented hot-token
    * recall trade.
    */
  def writeBm25Index(corpus: DataFrame, text: Column, id: Column,
      tableName: String, path: String, buckets: Int = 0,
      maxPostings: Int = 65536): Unit = {
    require(buckets >= 0 && maxPostings >= 1,
      "writeBm25Index: buckets >= 0 (0 = auto) and maxPostings >= 1")
    // one corpus tokenization total (the bm25Retrieve discipline) —
    // persisted by hand because the scope ends in a WRITE, not a
    // frame; build + stats + index rows are THE SAME helpers
    // bm25Retrieve runs, so the two serve paths cannot drift
    val post = TextOps.bm25Postings(corpus, text, id)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val (s, n, maxDl) = TextOps.bm25CorpusStats(post, "writeBm25Index")
      val spark = post.sparkSession
      // torn-build guard: stats and a trailing SEAL carry one shared
      // build token; the postings write sits between them, so a probe
      // that sees stats.token == seal.token knows the whole
      // stats → postings → seal sequence completed. A build that dies
      // mid-postings leaves fresh stats beside a stale (or absent)
      // seal and the probe FAILS LOUDLY instead of silently scoring
      // new postings with mismatched corpus stats. Both files carry
      // DRIVER SCALARS (4 values / 1 token) — written as plain FS
      // files, not 1-row parquet datasets whose write+read cost four
      // Spark jobs of pure overhead per serve execution.
      val token = java.util.UUID.randomUUID().toString
      // clear any legacy 1-row-parquet stats/seal datasets first
      // (ADVICE r15): rebuilding over an old-format dir must not leave
      // stale parquet files beside the new scalar text files
      val fsRoot = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      Seq(s"$path/stats", s"$path/seal").foreach { d =>
        val dp = new org.apache.hadoop.fs.Path(d)
        if (fsRoot.exists(dp)) fsRoot.delete(dp, true)
      }
      writeScalarFile(spark, s"$path/stats/stats.txt",
        s"$s\n$n\n$maxDl\n$token")
      // the autoBuckets count job reads the PERSISTED postings — the
      // one frame already materialized for the stats job
      val nb = resolveBuckets(buckets, post.count())
      bucketAligned(TextOps.bm25IndexRows(post, n, maxPostings), nb,
          Seq("tok"))
        .write.format("parquet")
        .bucketBy(nb, "tok").sortBy("tok")
        .option("path", s"$path/postings")
        .mode("overwrite").saveAsTable(tableName)
      writeScalarFile(spark, s"$path/seal/seal.txt", token)
    } finally post.unpersist(blocking = false)
  }

  private def writeScalarFile(spark: SparkSession, file: String,
      body: String): Unit = {
    val hp = new org.apache.hadoop.fs.Path(file)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(hp, true)
    try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def readScalarFile(spark: SparkSession,
      file: String): Option[String] = {
    val hp = new org.apache.hadoop.fs.Path(file)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(hp)) None
    else {
      val in = fs.open(hp)
      try Some(new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8))
      finally in.close()
    }
  }

  /** Probe the bucketed BM25 index: N queries, each touching only its
    * terms' posting buckets. Exact fixed-point Okapi, bit-identical to
    * [[TextOps.bm25Retrieve]] (same `44·tf·S / (20·tf·S + 6·S +
    * 18·dl·N)` rational at k1 = 1.2, b = 0.75; same
    * `idf_nano · ppm div 10⁶` long contribution; same
    * (score desc, doc_id) rank cut). Emits
    * `(q_id, doc_id, rank, score_nano)`.
    */
  def bm25ProbeIndex(spark: SparkSession, tableName: String, path: String,
      queries: DataFrame, qText: Column, qId: Column,
      k: Int = 10): DataFrame = {
    require(k >= 1, s"bm25ProbeIndex: k must be >= 1, got $k")
    val stats = readScalarFile(spark, s"$path/stats/stats.txt")
      .getOrElse {
        // distinguish "never built" from "built before the stats moved
        // from a 1-row parquet dataset to stats.txt" (ADVICE r15): a
        // legacy stats dir without the text file means the index needs
        // a REBUILD, not a first build
        val sp2 = new org.apache.hadoop.fs.Path(s"$path/stats")
        val fs2 = sp2.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs2.exists(sp2)) throw new IllegalStateException(
          s"bm25ProbeIndex: stats at $path use a legacy format " +
            "(parquet dataset, no stats.txt) - the index format " +
            "changed; rebuild the index (writeBm25Index) before probing")
        throw new IllegalStateException(
          s"bm25ProbeIndex: no stats at $path - build the index " +
            "(writeBm25Index) before probing")
      }
      .split("\n").map(_.trim)
    val (s, n, maxDl, token) =
      (stats(0).toLong, stats(1).toLong, stats(2).toInt, stats(3))
    val seal = readScalarFile(spark, s"$path/seal/seal.txt")
      .map(_.trim).getOrElse("")
    require(seal == token,
      s"bm25ProbeIndex: torn index build at $path - stats token " +
        s"'$token' != seal token '$seal'; rebuild the index " +
        "(writeBm25Index) before probing")
    TextOps.bm25Guard(s, maxDl, "bm25ProbeIndex")
    TextOps.bm25Probe(spark.table(tableName), queries, qText, qId, k, s, n)
  }

  /** The round-trip composite for the oracle row: build + write the
    * bucketed index, re-read it through the catalog, probe. One call =
    * the whole materialize-then-serve lifecycle.
    */
  def bm25ServeBucketed(corpus: DataFrame, text: Column, id: Column,
      queries: DataFrame, qText: Column, qId: Column, k: Int,
      tableName: String, path: String, buckets: Int = 0,
      maxPostings: Int = 65536): DataFrame = {
    writeBm25Index(corpus, text, id, tableName, path, buckets, maxPostings)
    bm25ProbeIndex(corpus.sparkSession, tableName, path,
      queries, qText, qId, k)
  }

  /** WRITE the IVF cell index ([[VectorOps.vectorIndex]]'s frame:
    * `_idx_id`, `_idx_v`, `_cell`, `_idx_n`) bucketed + sorted by
    * `_cell` — each inverted list lands in a known bucket file, so an
    * arriving probe batch joins against the index with no index-side
    * Exchange, ever.
    */
  def writeVectorIndex(corpus: DataFrame, idCol: String, vecCol: String,
      cents: Array[Array[Float]], tableName: String, path: String,
      buckets: Int = 0): Unit = {
    require(buckets >= 0, "writeVectorIndex: buckets >= 0 (0 = auto)")
    // index rows = corpus rows exactly (one per vector): the auto law's
    // count job is a parquet metadata count, no scan
    val nb = resolveBuckets(buckets, corpus.count())
    bucketAligned(VectorOps.vectorIndexFrame(corpus, idCol, vecCol, cents),
        nb, Seq("_cell"))
      .write.format("parquet")
      .bucketBy(nb, "_cell").sortBy("_cell")
      .option("path", s"$path/cells")
      .mode("overwrite").saveAsTable(tableName)
  }

  /** WRITE the minhash LSH band index
    * ([[graft.operators.text.Dedup.nearDupIndex]]'s frame: `doc_id`,
    * `sh`, `band`, `bh`) bucketed + sorted by the probe key
    * `(band, bh)` — the third of the three claimed co-located serving
    * artifacts (BM25 postings, IVF cells, LSH bands).
    */
  def writeNearDupIndex(corpus: DataFrame, text: Column, id: Column,
      tableName: String, path: String, bands: Int = 4,
      rowsPerBand: Int = 2, buckets: Int = 0): Unit = {
    require(buckets >= 0, "writeNearDupIndex: buckets >= 0 (0 = auto)")
    // index rows = corpus rows × bands exactly: metadata count, no scan
    val nb = resolveBuckets(buckets, corpus.count() * bands)
    bucketAligned(graft.operators.text.Dedup
        .nearDupIndex(corpus, text, id, bands, rowsPerBand),
        nb, Seq("band", "bh"))
      .write.format("parquet")
      .bucketBy(nb, "band", "bh").sortBy("band", "bh")
      .option("path", s"$path/bands")
      .mode("overwrite").saveAsTable(tableName)
  }

  /** Round-trip LSH near-dup serve: write the bucketed band index,
    * re-read, probe with [[graft.operators.text.Dedup.nearDupVsIndex]]
    * — identical banding and exact-Jaccard verify, so the query shares
    * `dedup_vs_index`'s oracle.
    */
  def nearDupVsBucketedIndex(arrivals: DataFrame, corpus: DataFrame,
      text: Column, id: Column, threshold: Double,
      tableName: String, path: String, bands: Int = 4,
      rowsPerBand: Int = 2, buckets: Int = 0): DataFrame = {
    writeNearDupIndex(corpus, text, id, tableName, path, bands,
      rowsPerBand, buckets)
    graft.operators.text.Dedup.nearDupVsIndex(arrivals, text, id,
      arrivals.sparkSession.table(tableName), threshold, bands,
      rowsPerBand)
  }

  /** Round-trip vector serve: write the bucketed cell index, re-read,
    * probe with [[VectorOps.annVsIndex]] — identical arithmetic, so
    * the query shares `emb_vs_vector_index`'s oracle.
    */
  def annVsBucketedIndex(arrivals: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, cents: Array[Array[Float]],
      threshold: Double, nProbe: Int, tableName: String, path: String,
      buckets: Int = 0): DataFrame = {
    writeVectorIndex(corpus, idCol, vecCol, cents, tableName, path, buckets)
    VectorOps.annVsIndex(arrivals,
      arrivals.sparkSession.table(tableName),
      idCol, vecCol, cents, threshold, nProbe)
  }
}
