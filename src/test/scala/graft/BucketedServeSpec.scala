package graft

import graft.core.{Sessions, Tables}
import graft.operators.serve.BucketedServe
import graft.operators.text.TextOps
import graft.operators.vector.VectorOps
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bucketed-index co-location claim, executed: the BM25 posting
  * table and the IVF cell index are written `bucketBy(probe key)` to a
  * real path, re-read through the catalog, and the probe join must
  * need NO Exchange on the index side — the bucketed scan itself
  * satisfies the join's required distribution. Broadcast is disabled
  * for the plan asserts (a broadcast join would make "no index-side
  * shuffle" vacuously true); AQE is disabled so the physical tree is
  * inspectable without stage wrappers. Value asserts re-enable nothing:
  * the round-tripped artifact must serve bit-identical rows to the
  * non-bucketed serve path.
  */
class BucketedServeSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4, "bucketed-serve")
  val sf = "/root/testdata/sf0.001"

  private def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a +: flatten(a.executedPlan)
    case _ => p +: (p.children ++ p.subqueries).flatMap(flatten)
  }

  /** Assert the shuffled join over `probeKey` reads the bucketed scan
    * with no Exchange between the join and the scan, and return the
    * join for further checks.
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
    val idxJoins = shuffledJoins.filter(j =>
      j.children.exists(hasIdxScan))
    assert(idxJoins.nonEmpty,
      s"no shuffled join over the bucketed index in:\n$plan")
    idxJoins.foreach { j =>
      val idxSide = j.children.filter(hasIdxScan)
      idxSide.foreach { side =>
        val ex = flatten(side).collect { case e: ShuffleExchangeLike => e }
        assert(ex.isEmpty,
          s"Exchange on the bucketed-index side of the probe join:\n$side")
      }
    }
    // and the scan really is bucket-pruned/bucketed, not a plain scan
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

  test("bm25 probe joins the bucketed posting table with no index-side exchange") {
    val docs = Tables.documents(spark, sf)
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_bm25_spec").toString
    BucketedServe.writeBm25Index(docs, col("text"), col("doc_id"),
      "graft_bm25_spec_idx", tmp, buckets = 4)
    withShuffledJoins {
      val probe = BucketedServe.bm25ProbeIndex(spark,
        "graft_bm25_spec_idx", tmp,
        docs.filter(col("doc_id") % 101 === 0),
        substring(col("text"), 1, 80), col("doc_id"), k = 5)
      assertColocated(probe.queryExecution.executedPlan, "graft_bm25_spec")
    }
  }

  test("bucketed bm25 serve is bit-identical to bm25Retrieve") {
    val docs = Tables.documents(spark, sf)
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_bm25_spec2").toString
    val viaIndex = BucketedServe.bm25ServeBucketed(
      docs, col("text"), col("doc_id"),
      docs.filter(col("doc_id") % 101 === 0),
      substring(col("text"), 1, 80), col("doc_id"), k = 5,
      tableName = "graft_bm25_spec_idx2", path = tmp)
    val direct = TextOps.bm25Retrieve(docs, col("text"), col("doc_id"),
      docs.filter(col("doc_id") % 101 === 0),
      substring(col("text"), 1, 80), col("doc_id"), k = 5)
    assert(viaIndex.collect().toSet === direct.collect().toSet)
  }

  test("vector probe joins the bucketed cell index with no index-side exchange") {
    val emb = Tables.embeddings(spark, sf)
    val idx = emb.filter(col("vec_id") % 7 =!= 0)
    val cents = VectorOps.ivfCentroids(idx, "vec_id", "embedding", 8)
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_cell_spec").toString
    BucketedServe.writeVectorIndex(idx, "vec_id", "embedding", cents,
      "graft_cell_spec_idx", tmp, buckets = 4)
    withShuffledJoins {
      val probe = VectorOps.annVsIndex(emb.filter(col("vec_id") % 7 === 0),
        spark.table("graft_cell_spec_idx"),
        "vec_id", "embedding", cents, 0.4, nProbe = 8)
      assertColocated(probe.queryExecution.executedPlan, "graft_cell_spec")
    }
  }

  test("LSH probe joins the bucketed band index with no index-side " +
      "exchange, and serves bit-identical to the in-memory index") {
    import graft.operators.text.Dedup
    val docs = Tables.documents(spark, sf)
    val idxDocs = docs.filter(col("doc_id") % 7 =!= 0)
    val arrivals = docs.filter(col("doc_id") % 7 === 0)
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_band_spec").toString
    BucketedServe.writeNearDupIndex(idxDocs, col("text"), col("doc_id"),
      "graft_band_spec_idx", tmp, buckets = 4)
    withShuffledJoins {
      val probe = Dedup.nearDupVsIndex(arrivals, col("text"),
        col("doc_id"), spark.table("graft_band_spec_idx"), 0.3)
      assertColocated(probe.queryExecution.executedPlan, "graft_band_spec")
    }
    val viaBucketed = Dedup.nearDupVsIndex(arrivals, col("text"),
      col("doc_id"), spark.table("graft_band_spec_idx"), 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val direct = Dedup.nearDupVsIndex(arrivals, col("text"),
      col("doc_id"),
      Dedup.nearDupIndex(idxDocs, col("text"), col("doc_id")), 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(viaBucketed === direct)
  }

  test("autoBuckets: the occupancy law — smallest power of two at or " +
      "under the row target, clamped to [8, 65536], pure integer " +
      "arithmetic at exact powers of two") {
    val T = 4L << 20
    // floor: small corpora stay at the historical 8
    assert(BucketedServe.autoBuckets(0L) == 8)
    assert(BucketedServe.autoBuckets(1L) == 8)
    assert(BucketedServe.autoBuckets(T) == 8)
    assert(BucketedServe.autoBuckets(8L * T) == 8)
    // growth: want = ceil(rows/target) rounded up to a power of two
    assert(BucketedServe.autoBuckets(8L * T + 1L) == 16)
    assert(BucketedServe.autoBuckets(9L * T) == 16)
    assert(BucketedServe.autoBuckets(16L * T) == 16)
    assert(BucketedServe.autoBuckets(17L * T) == 32)
    // exact power of two stays exact (the integer-arithmetic rule —
    // a float log here could bump 1024 to 2048)
    assert(BucketedServe.autoBuckets(1024L * T) == 1024)
    // ceiling: file-count blowup is capped
    assert(BucketedServe.autoBuckets(Long.MaxValue / 4) == 65536)
    // the 100 TB worked example from SCALE.md: ~2.5e12 posting rows
    assert(BucketedServe.autoBuckets(2500000000000L) == 65536)
    // driver corpora resolve to the floor — auto default changes no
    // registered plan (measured posting rows: BenchBucketKnob)
    assert(BucketedServe.autoBuckets(116231L) == 8)   // sf0.1 postings
    assert(BucketedServe.autoBuckets(1162310L) == 8)  // sf1 postings
  }

  test("bucketed vector serve is bit-identical to the in-memory index") {
    val emb = Tables.embeddings(spark, sf)
    val idx = emb.filter(col("vec_id") % 7 =!= 0)
    val cents = VectorOps.ivfCentroids(idx, "vec_id", "embedding", 8)
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_cell_spec2").toString
    val viaBucketed = BucketedServe.annVsBucketedIndex(
      emb.filter(col("vec_id") % 7 === 0), idx,
      "vec_id", "embedding", cents, 0.4, nProbe = 8,
      tableName = "graft_cell_spec_idx2", path = tmp)
    val direct = VectorOps.annVsIndex(emb.filter(col("vec_id") % 7 === 0),
      VectorOps.vectorIndex(idx, "vec_id", "embedding", cents),
      "vec_id", "embedding", cents, 0.4, nProbe = 8)
    assert(viaBucketed.collect().toSet === direct.collect().toSet)
  }
}
