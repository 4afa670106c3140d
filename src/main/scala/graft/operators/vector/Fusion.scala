package graft.operators.vector

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) — the
  * standard hybrid-retrieval combiner: merge N per-query rankings
  * (sparse BM25, dense cosine, binary Hamming, …) into one list by
  *   rrf(d) = Σ_lists 1 / (c + rank_list(d)),
  * which rewards documents that rank well ANYWHERE without comparing
  * incomparable scores (a cosine sim and a BM25 score share no scale;
  * ranks do). The RAG-serving staple for "BM25 + embeddings" hybrid
  * search.
  *
  * Fixed point: each contribution is `Nano div (c + rank)` — exact
  * truncating integer division — and the per-document sum is an exact
  * long add, so fused scores are partition-order-exact and replay
  * bit-for-bit in any engine (no float summation order anywhere).
  * Ties break by (rrf_nano DESC, id) — a total order, deterministic
  * cut at any partitioning.
  *
  * 100 TB shape: inputs are ALREADY k-bounded rankings (each list is
  * queries × k rows, never corpus-sized), so the fusion is one
  * unionByName + one map-side-combinable (q_id, id) sum + one rank
  * window partitioned by q_id over ≤ N·k rows per query. The fusion
  * itself never touches the corpus — the lists' own retrieval paths
  * (annTopK / hammingRerank / bm25TopK) carry the scale story.
  */
object Fusion {

  val Nano = 1000000000L

  /** Build fusion arms CONCURRENTLY (guide §2.6 "overlap independent
    * jobs"): a retrieval arm's construction runs eager driver-side
    * work — CacheScope checkpoints, matStream spreads, 1-row stats
    * collects — and building arms sequentially leaves the cluster
    * idle through every arm's tail. Spark's scheduler happily runs
    * jobs submitted from several threads; the pool threads are
    * created from the CALLING thread, so inheritable job
    * group/description properties (the bench's per-query cancellation
    * group) carry over. Results are the same frames the sequential
    * construction yields — only the wall-clock overlap changes.
    */
  def buildArms(builders: Seq[() => DataFrame]): Seq[DataFrame] = {
    if (builders.lengthCompare(1) <= 0) return builders.map(_())
    val pool = java.util.concurrent.Executors
      .newFixedThreadPool(builders.size)
    try {
      val futs = builders.map { b =>
        pool.submit(new java.util.concurrent.Callable[DataFrame] {
          def call(): DataFrame = b()
        })
      }
      futs.map { f =>
        try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            throw e.getCause // the arm's own error, not the wrapper
        }
      }
    } finally pool.shutdown()
  }

  /** Fuse per-query rankings. Each input must carry `(q_id, id, rnk)`
    * with `rnk` 1-based within its own (list, q_id). Returns the
    * top-`k` fused rows per query:
    * `(q_id, id, rrf_nano, n_lists, rnk)` — fused score in nano units,
    * how many input lists ranked the id, and the fused rank.
    */
  def rrfFuse(lists: Seq[DataFrame], c: Int = 60, k: Int = 10)
      : DataFrame = {
    require(lists.nonEmpty, "rrfFuse: at least one ranking required")
    require(c >= 0, s"rrfFuse: c must be >= 0, got $c")
    require(k >= 1, s"rrfFuse: k must be >= 1, got $k")
    val all = lists.map(_.select(col("q_id"), col("id"),
      col("rnk").cast("long").as("rnk"))).reduce(_ unionByName _)
    val fused = all
      .select(col("q_id"), col("id"),
        expr(s"$Nano div ($c + rnk)").as("_s"))
      .groupBy(col("q_id"), col("id"))
      .agg(sum(col("_s")).as("rrf_nano"),
        count(lit(1)).as("n_lists"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("rrf_nano").desc, col("id"))
    fused.withColumn("rnk", row_number().over(w).cast("int"))
      .filter(col("rnk") <= k)
  }
}
