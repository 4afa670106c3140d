package graft.operators.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (Array[Float]).
  *
  * Determinism: dot products fold left-to-right with a DOUBLE accumulator
  * over FLOAT products — the exact sequence DuckDB's list_reduce replays,
  * so brute-force cosine top-k is oracle-matchable bit-for-bit.
  *
  * Scale path: [[lshBucket]] sign-bit bucketing (random-hyperplane LSH with
  * md5-derived deterministic planes) turns the quadratic scan into a
  * bucket-local join — the IVF/LSH ANN variant.
  */
object VectorOps {

  /** Sequential-fold dot product: Σ a[i]*b[i], double accumulator. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k: broadcast the (small) query set against the
    * corpus, rank per query. The per-query ranking partitions on q_id —
    * parallel across queries, no global sort.
    */
  /** Broadcast ceiling for the query side of [[bruteTopK]] — at 64 float
    * dims, 100k rows ≈ 25 MB broadcast. A silently-unbroadcast regression
    * would OOM executors long before any plan lint fires, so the bound is
    * checked eagerly with one cheap count.
    */
  val MaxBroadcastQueries = 100000L

  def bruteTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      maxQueryRows: Long = MaxBroadcastQueries): DataFrame = {
    // fail fast if the "small" side isn't: the crossJoin below is only
    // 100 TB-safe because q is broadcast
    val qCount = queries.count()
    require(qCount <= maxQueryRows,
      s"bruteTopK query side has $qCount rows (max $maxQueryRows): too " +
        "large to broadcast — use annTopK, or raise maxQueryRows explicitly")
    // norms are precomputed per side — a corpus vector's norm must not be
    // re-derived once per query (Q× waste at scale); sim per pair is then
    // one dot product + one divide
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
      .withColumn("_qn", norm(col("q_vec")))
    val c = corpus.select(col(idCol), col(vecCol))
      .withColumn("_cn", norm(col(vecCol)))
    val scored = c.crossJoin(broadcast(q))
      .filter(col(idCol) =!= col("q_id"))
      .withColumn("sim", dot(col(vecCol), col("q_vec")) / (col("_cn") * col("_qn")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col(idCol))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col(idCol), round(col("sim"), 6).as("sim"))
  }

  /** Deterministic pseudo-random hyperplanes: component (plane j, dim i)
    * derived from md5("plane_j_i") mapped into [-1, 1). Computed driver-side
    * once, shipped as literals.
    */
  def planes(nPlanes: Int, dim: Int): Seq[Array[Float]] = {
    val mdig = java.security.MessageDigest.getInstance("MD5")
    (0 until nPlanes).map { j =>
      Array.tabulate(dim) { i =>
        val h = mdig.digest(s"plane_${j}_$i".getBytes("UTF-8"))
          .take(8).foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
        ((java.lang.Long.remainderUnsigned(h, 2001L) - 1000L) / 1000.0).toFloat
      }
    }
  }

  /** Sign-bit LSH bucket id: bit j = (v · plane_j) > 0. */
  def lshBucket(vec: Column, planes: Seq[Array[Float]]): Column =
    planes.zipWithIndex.map { case (p, j) =>
      val planeCol = array(p.toIndexedSeq.map(lit(_)): _*)
      when(dot(vec, planeCol) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Per-plane signed projections as one materialized array column (HOFs
    * are interpreted — the array must not be rebuilt per consumer).
    */
  private def planeDots(vec: Column, ps: Seq[Array[Float]]): Column =
    array(ps.map { p =>
      dot(vec, array(p.toIndexedSeq.map(lit(_)): _*))
    }: _*)

  private def bucketFromDots(dots: Column, nPlanes: Int): Column =
    (0 until nPlanes).map { j =>
      when(element_at(dots, j + 1) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Multi-probe bucket list: the home bucket plus, for `probes - 1`
    * additional probes, the bucket with the LEAST-CONFIDENT sign bit
    * flipped (smallest |projection| — the standard multi-probe heuristic:
    * a near neighbour that hashed differently most likely differs in the
    * plane the query is closest to). Ties break to the lower plane index,
    * so probing is deterministic.
    */
  private def probeBuckets(dots: Column, nPlanes: Int, probes: Int): Column = {
    val home = bucketFromDots(dots, nPlanes)
    if (probes <= 1) array(home)
    else {
      val byConfidence = sort_array(array((0 until nPlanes).map { j =>
        struct(abs(element_at(dots, j + 1)).as("d"), lit(j).as("j"))
      }: _*))
      val flips = slice(byConfidence, 1, math.min(probes - 1, nPlanes))
      // 1L << j with a column shift amount: indexed literal array (Spark's
      // shiftleft only takes a constant shift)
      val bitOf = array((0 until nPlanes).map(j => lit(1L << j)): _*)
      concat(array(home),
        transform(flips, f =>
          home.bitwiseXOR(element_at(bitOf, f.getField("j") + 1))))
    }
  }

  /** ANN top-k: candidates share the query's LSH bucket (equi-join on
    * bucket — shuffle-partitionable), then exact cosine rank inside the
    * bucket. Approximate: recall < 1 by construction; the scale path for
    * corpora where bruteTopK's quadratic scan is unaffordable.
    *
    * `probes` is the recall knob: each query additionally probes the
    * buckets reached by flipping its `probes - 1` least-confident sign
    * bits (multi-probe LSH). Corpus buckets partition the corpus, so
    * probe candidates are disjoint — no dedup join needed; cost grows
    * linearly in `probes`, never quadratically.
    */
  def annTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nPlanes: Int = 8,
      dim: Int = 64,
      probes: Int = 1): DataFrame = {
    val ps = planes(nPlanes, dim)
    val c = corpus.select(col(idCol), col(vecCol))
      .withColumn("_bkt", lshBucket(col(vecCol), ps))
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
      .withColumn("_dots", planeDots(col("q_vec"), ps))
      .withColumn("_probes", probeBuckets(col("_dots"), nPlanes, probes))
      .withColumn("_bkt", explode(col("_probes")))
      .drop("_dots", "_probes")
    val scored = c.withColumn("_cn", norm(col(vecCol)))
      .join(q.withColumn("_qn", norm(col("q_vec"))), "_bkt")
      .filter(col(idCol) =!= col("q_id"))
      .withColumn("sim", dot(col(vecCol), col("q_vec")) / (col("_cn") * col("_qn")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col(idCol))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col(idCol), round(col("sim"), 6).as("sim"))
  }
}
