package graft.operators.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding-space curation: cluster assignment + per-cluster caps
  * (SemDeDup/DataComp-style diversity pruning), deterministic label
  * centroids (class prototypes), and kNN label propagation (classify
  * unlabeled rows from their nearest labeled neighbours — the cheap
  * quality-classifier bootstrap).
  */
object VectorCuration {

  /** Deterministic md5-seeded centroids in [-1, 1) — the fixed-quantizer
    * twin of [[VectorOps.ivfCentroids]], same derivation family as
    * [[VectorOps.pqSeedBooks]]. Used where a REPLAYABLE partition of the
    * embedding space matters more than a data-adapted one (cross-engine
    * pinning, stable cluster ids across corpus versions).
    */
  def seedCentroids(k: Int, dim: Int): Array[Array[Float]] = {
    val mdig = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(k) { c =>
      Array.tabulate(dim) { i =>
        val h = mdig.digest(s"kmcent_${c}_$i".getBytes("UTF-8"))
          .take(8).foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
        ((java.lang.Long.remainderUnsigned(h, 2001L) - 1000L) / 2000.0)
          .toFloat
      }
    }
  }

  /** Nearest-centroid cluster id `as` for every row: argmin over the
    * materialized per-centroid distance array (codegen'd FLOAT sq-dist
    * folds, ties to the LOWER cluster id) — the assignment half of
    * k-means, pure scan, zero shuffle at any corpus size.
    */
  def clusterAssign(df: DataFrame, vecCol: String,
      cents: Array[Array[Float]], as: String = "cell"): DataFrame = {
    val dists = array(cents.toIndexedSeq.map(cent =>
      graft.functions.VectorExpressions.floatSqDist(
        col(vecCol), array(cent.toIndexedSeq.map(lit(_)): _*))): _*)
    df.withColumn("_cd", dists)
      .withColumn(as,
        (array_position(col("_cd"), array_min(col("_cd"))) - 1).cast("int"))
      .drop("_cd")
  }

  /** Cluster-capped diversity pruning: assign every row to its nearest
    * centroid, then keep at most `n` rows per cluster, chosen by the
    * deterministic md5 rank of [[graft.operators.text.Curation
    * .capPerKey]]. The embedding-space analogue of the per-domain cap —
    * bounds how much near-identical content any one region of the space
    * contributes to the training mix.
    *
    * 100 TB shape: assignment is a scan; the cap is one shuffle on the
    * cluster id with a partitioned window. Cluster count bounds the
    * parallelism of the cap stage — size k so the largest cluster fits a
    * task (or pre-thin with [[graft.operators.text.TextOps.hashSample]]).
    */
  def clusterCap(df: DataFrame, idCol: String, vecCol: String,
      cents: Array[Array[Float]], n: Int, as: String = "cell")
      : DataFrame =
    graft.operators.text.Curation.capPerKey(
      clusterAssign(df, vecCol, cents, as), Seq(col(as)), col(idCol), n)

  /** Embedding-space outlier pruning: assign every row to its nearest
    * centroid, then per cluster keep only the `keepFrac` CLOSEST rows
    * (by exact sq-dist to the centroid, ties to the lower id) — rows in
    * a cluster's distance tail are mislabeled/degenerate/off-manifold
    * embeddings (truncated docs, wrong-language text, dead images) and
    * this is the standard cheap filter for them. A rank rule, NOT a
    * mean/std z-score: quantiles need no distributed float moments, so
    * the decision is deterministic at any partitioning with no
    * fixed-point machinery. `annotate = true` keeps everything and
    * lands `is_outlier` instead of dropping.
    *
    * 100 TB shape: assignment is the [[clusterAssign]] scan; the rank
    * is one shuffle on the cluster id with a partitioned window (the
    * [[clusterCap]] cost model — size k so the largest cluster fits a
    * task, or pre-thin with hashSample).
    */
  def clusterOutlierPrune(df: DataFrame, idCol: String, vecCol: String,
      cents: Array[Array[Float]], keepFrac: Double,
      as: String = "cell", annotate: Boolean = false): DataFrame = {
    require(keepFrac > 0 && keepFrac <= 1,
      s"clusterOutlierPrune: keepFrac must be in (0, 1], got $keepFrac")
    val dists = array(cents.toIndexedSeq.map(cent =>
      graft.functions.VectorExpressions.floatSqDist(
        col(vecCol), array(cent.toIndexedSeq.map(lit(_)): _*))): _*)
    val base = df.withColumn("_cd", dists)
      .withColumn(as,
        (array_position(col("_cd"), array_min(col("_cd"))) - 1)
          .cast("int"))
      .withColumn("_dist", array_min(col("_cd")))
      .drop("_cd")
    val w = Window.partitionBy(col(as)).orderBy(col("_dist"), col(idCol))
    val ranked = base
      .withColumn("_rn", row_number().over(w))
      .withColumn("_nc", count(lit(1)).over(Window.partitionBy(col(as))))
    val kept = col("_rn") <= ceil(lit(keepFrac) * col("_nc"))
    (if (annotate) ranked.withColumn("is_outlier", !kept)
     else ranked.filter(kept))
      .drop("_rn", "_nc", "_dist")
  }

  /** Distributed k-means training (Lloyd iterations) from a given
    * centroid seed — the fully-distributed twin of
    * [[VectorOps.ivfCentroids]]'s bounded-sample training: at corpus
    * scale the training data CANNOT collect, so each iteration is (a)
    * the [[clusterAssign]] argmin scan (codegen'd FLOAT sq-dist folds,
    * zero shuffle) and (b) one per-(cluster, dim) fixed-point mean —
    * the [[labelCentroids]] arithmetic: floor(x·10⁶) LONG sums are
    * associative, so the update is partition-order-exact and a SQL
    * oracle can replay every iteration bit-for-bit. Only the k·dim
    * UPDATE rows ever reach the driver (the sanctioned bounded collect
    * class — same as IVF's coarse quantizer, NOT data-sized). Empty
    * clusters keep their previous centroid (the deterministic
    * standard rule). New centroid components are
    * `(Σ floor(x·10⁶)) / (10⁶ · n)` cast to FLOAT — one correctly-
    * rounded double division + one correctly-rounded narrowing, hence
    * bit-identical on every engine.
    *
    * 100 TB shape: iters × (scan + one map-side-combined aggregate to
    * k·dim rows). No data-sized shuffle beyond the aggregate, no
    * broadcast but the k·dim literal table inside the argmin
    * expression. Seed with [[seedCentroids]] for replayability or
    * k-means‖-style sampled seeds when adaptivity matters.
    */
  def kmeansTrain(df: DataFrame, vecCol: String,
      init: Array[Array[Float]], iters: Int,
      scale: Long = 1000000L): Array[Array[Float]] = {
    require(iters >= 0, s"kmeansTrain: iters must be >= 0, got $iters")
    val k = init.length
    var cents = init
    var it = 0
    while (it < iters) {
      val upd = clusterAssign(df, vecCol, cents, "_cell")
        .select(col("_cell"), posexplode(col(vecCol)).as(Seq("pos", "_x")))
        .groupBy(col("_cell"), col("pos"))
        .agg(count(lit(1)).as("_n"),
          sum(floor(col("_x").cast("double") * scale).cast("long"))
            .as("_s"))
        .collect() // bounded: ≤ k·dim rows, never data-sized
      val next = Array.tabulate(k)(c => cents(c).clone())
      upd.foreach { r =>
        val c = r.getAs[Int]("_cell")
        val p = r.getAs[Int]("pos")
        next(c)(p) = (r.getAs[Long]("_s").toDouble /
          (scale.toDouble * r.getAs[Long]("_n"))).toFloat
      }
      cents = next
      it += 1
    }
    cents
  }

  /** Per-label mean embedding (class prototypes), in long form
    * (label, pos, mean) — array-free output, one row per component.
    *
    * Determinism: distributed float sums depend on partial-aggregation
    * order, so the mean is accumulated in FIXED-POINT — each component
    * quantizes to floor(x·10⁶) as a LONG, longs sum associatively (any
    * partition order gives the same total), and the mean divides back
    * out once at the end. The quantization error (≤ 10⁻⁶ per element,
    * before an n-fold average) is far below any curation decision
    * threshold; the reproducibility is exact. The final division is ONE
    * IEEE operation over exact integer operands — correctly rounded,
    * hence bit-identical on every engine — so the mean is emitted
    * unrounded (a round(x, n) here would re-introduce the decimal
    * half-way ambiguity the fixed-point sum just removed).
    *
    * 100 TB shape: posexplode fans dim×, then one map-side-combined
    * aggregate down to |labels|·dim rows. No window, no collect.
    */
  def labelCentroids(df: DataFrame, vecCol: String, labelCol: String,
      scale: Long = 1000000L): DataFrame =
    df.select(col(labelCol), posexplode(col(vecCol)).as(Seq("pos", "_x")))
      .groupBy(col(labelCol), (col("pos") + 1).as("pos"))
      .agg(count(lit(1)).as("_n"),
        sum(floor(col("_x").cast("double") * scale).cast("long")).as("_s"))
      .withColumn("mean", col("_s") / (lit(scale.toDouble) * col("_n")))
      .drop("_n", "_s")

  /** kNN label propagation: each query row takes the majority label of
    * its `k` nearest labeled neighbours by exact cosine (ties: higher
    * vote count first, then the LOWER label — fully deterministic).
    * The standard cheap classifier over an embedded corpus: label a
    * seed set by hand, propagate to the rest by proximity.
    *
    * Scale shape inherits [[VectorOps.bruteTopK]]'s contract: the QUERY
    * side broadcasts (guarded), the labeled corpus streams through a
    * scan — per-batch cost is |corpus|·|queries| dot products, so batch
    * queries accordingly; for corpus-sized query sets use the LSH/IVF
    * candidate generation of [[VectorOps.annTopK]] upstream and this
    * vote on the survivors.
    */
  /** Hard-negative mining for contrastive/embedding training: for each
    * query row, the top-k most-similar corpus rows with a DIFFERENT
    * label — the near-miss examples a contrastive loss learns most
    * from (in-batch random negatives are too easy; same-label
    * neighbours would be false negatives). [[VectorOps.bruteTopK]]'s
    * guarded broadcast scan with the label-inequality predicate pushed
    * into the pair filter, so excluded pairs never reach the ranking
    * window. Returns `(q_id, rnk, id, neg_label, sim)`.
    *
    * 100 TB shape: the yardstick form (queries broadcast, guarded); a
    * corpus-sized query set generates candidates with
    * [[VectorOps.annTopK]]/[[knnLabelAnn]]'s bucket join first and
    * applies the same label filter on the survivors.
    */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, labelCol: String, k: Int,
      maxQueryRows: Long = 100000L): DataFrame = {
    val qCount = queries.count()
    require(qCount <= maxQueryRows,
      s"hardNegatives query side has $qCount rows (max $maxQueryRows): " +
        "too large to broadcast — generate candidates with annTopK first")
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
        col(labelCol).as("_ql"))
      .withColumn("_qn", VectorOps.norm(col("q_vec")))
    // materialized corpus norms (the bruteTopK rule: un-checkpointed,
    // the norm fold re-runs per pair under the broadcast join)
    val c = VectorOps.matStream(
      corpus.select(col(idCol), col(vecCol), col(labelCol).as("_nl"))
        .withColumn("_cn", VectorOps.norm(col(vecCol))))
    val scored = c.crossJoin(broadcast(q))
      .filter(col(idCol) =!= col("q_id") && col("_nl") =!= col("_ql"))
      .withColumn("sim",
        VectorOps.dot(col(vecCol), col("q_vec")) / (col("_cn") * col("_qn")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc,
      col(idCol))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk").cast("int").as("rnk"), col(idCol),
        col("_nl").as("neg_label"), round(col("sim"), 6).as("sim"))
  }

  def knnLabel(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, labelCol: String, k: Int,
      maxQueryRows: Long = 100000L): DataFrame = {
    // bruteTopK's scan shape, with the neighbour's label carried through
    // the ranking (re-joining the corpus afterwards would shuffle the
    // big side a second time just to recover a column it already had)
    val qCount = queries.count()
    require(qCount <= maxQueryRows,
      s"knnLabel query side has $qCount rows (max $maxQueryRows): too " +
        "large to broadcast — generate candidates with annTopK upstream")
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
      .withColumn("_qn", VectorOps.norm(col("q_vec")))
    // materialized corpus norms (the bruteTopK rule)
    val c = VectorOps.matStream(
      corpus.select(col(idCol), col(vecCol), col(labelCol).as("_nl"))
        .withColumn("_cn", VectorOps.norm(col(vecCol))))
    val scored = c.crossJoin(broadcast(q))
      .filter(col(idCol) =!= col("q_id"))
      .withColumn("sim",
        VectorOps.dot(col(vecCol), col("q_vec")) / (col("_cn") * col("_qn")))
    voteMajority(scored, idCol, k)
  }

  /** The 100 TB form of [[knnLabel]]: LSH-bucketed candidate generation
    * ([[VectorOps.lshBucket]] — the annTopK shape) instead of the
    * all-pairs broadcast scan, then the same k-rank + majority vote on
    * the bucket-join survivors. Neither side broadcasts and neither is
    * row-count-guarded: the join is a partitionable equi-join on the
    * bucket id, so corpus-sized query sets (label EVERYTHING unlabeled)
    * are fine. Approximation is recall-shaped only, exactly as in
    * annTopK: a query's voters are its nearest neighbours WITHIN its
    * bucket; queries with no bucket-mates are absent from the output.
    */
  def knnLabelAnn(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, labelCol: String, k: Int,
      nPlanes: Int = 8, dim: Int = 64): DataFrame = {
    val ps = VectorOps.planes(nPlanes, dim)
    val c = corpus.select(col(idCol), col(vecCol), col(labelCol).as("_nl"))
      .withColumn("_bkt", VectorOps.lshBucket(col(vecCol), ps))
      .withColumn("_cn", VectorOps.norm(col(vecCol)))
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
      .withColumn("_bkt", VectorOps.lshBucket(col("q_vec"), ps))
      .withColumn("_qn", VectorOps.norm(col("q_vec")))
    val scored = c.join(q, "_bkt")
      .filter(col(idCol) =!= col("q_id"))
      .withColumn("sim",
        VectorOps.dot(col(vecCol), col("q_vec")) / (col("_cn") * col("_qn")))
    voteMajority(scored, idCol, k)
  }

  /** Per-dimension whitening (z-score) of an embedding column — the
    * standardization step before distance-based curation (SemDeDup,
    * outlier pruning) when dimensions carry wildly different scales.
    * Emits `(id, z_nano)` with the z-vector as comma-joined NANO LONGS
    * (integer rendering is engine-stable; double→string formatting is
    * not — the emb_quantize serialization rule).
    *
    * Determinism: per-dim stats come from exact integral sums (micro-
    * quantized components, DECIMAL accumulation), and every downstream
    * value is one fixed IEEE chain over those exact integers — mean =
    * double(sx)/n/10⁶, var = double(sxx)/n/10¹² − mean², z =
    * round((xq − mean)/√var · 10⁹) — replayed verbatim by the oracle.
    * A zero-variance dimension whitens to 0 by definition.
    *
    * 100 TB shape: one d-keyed map-side-combined aggregate; the d-row
    * stats table is a BOUNDED driver collect (the kmeansTrain/IVF
    * sanction — never data-sized) embedded as literals, so the apply
    * pass is a pure scan with zero shuffle and no join at all.
    */
  def whiten(df: DataFrame, idCol: String, vecCol: String,
      scale: Long = 1000000L): DataFrame = {
    val xm = transform(col(vecCol),
      e => round(e.cast("double") * scale).cast("long"))
    val st = df.select(posexplode(xm).as(Seq("_i", "_x")))
      .groupBy(col("_i"))
      .agg(sum(col("_x").cast("decimal(38,0)")).as("_sx"),
        sum((col("_x") * col("_x")).cast("decimal(38,0)")).as("_sxx"),
        count(lit(1)).as("_n"))
      .collect() // bounded: d rows, never data-sized
    require(st.nonEmpty, "whiten: empty input")
    val d = st.map(_.getAs[Int]("_i")).max + 1
    val mean = new Array[Double](d)
    val sd = new Array[Double](d)
    val s2 = scale.toDouble * scale
    st.foreach { r =>
      val i = r.getAs[Int]("_i")
      val sx = r.getAs[java.math.BigDecimal]("_sx").doubleValue
      val sxx = r.getAs[java.math.BigDecimal]("_sxx").doubleValue
      val n = r.getAs[Long]("_n")
      val m = sx / n / scale
      val v = sxx / n / s2 - m * m
      mean(i) = m
      sd(i) = if (v > 0) math.sqrt(v) else 0.0
    }
    val zs = (0 until d).map { i =>
      if (sd(i) == 0.0) lit(0L).cast("string")
      else {
        val xq = round(element_at(col(vecCol), i + 1).cast("double") *
          scale).cast("long").cast("double") / scale
        round((xq - lit(mean(i))) / lit(sd(i)) * lit(1e9))
          .cast("long").cast("string")
      }
    }
    df.select(col(idCol), array_join(array(zs: _*), ",").as("z_nano"))
  }

  /** Fixed-point covariance matrix of an embedding column, in flat
    * (i, j, cov) rows — the input to [[pcaPowerTop]] and the
    * observability report for "is this embedding space degenerate".
    *
    * Determinism: each component quantizes to round(x·10⁶) as a LONG
    * (row-level, engine-exact); products and sums stay integral
    * (DECIMAL(38,0) sums so no corpus size can overflow); the final
    * cov = E[xy] − E[x]E[y] is a fixed chain of IEEE double ops over
    * exact integer operands, rounded to 6 places — replayable bit-exact
    * in any engine that follows the same chain.
    *
    * 100 TB shape: one d-keyed aggregate for the means + one d²-keyed
    * aggregate for the products, both map-side-combined down to at most
    * d² rows; the join of the two is broadcast (d-sized). The d² fan-out
    * per row is the one-pass covariance cost model — no driver collect,
    * no iteration.
    */
  def covarianceFixed(df: DataFrame, vecCol: String,
      scale: Long = 1000000L): DataFrame = {
    import df.sparkSession.implicits._
    val xm = transform(col(vecCol),
      e => round(e.cast("double") * scale).cast("long"))
    // Per-partition outer-product accumulator — the one genuinely
    // imperative kernel in the pack: the relational form (double
    // posexplode to d² rows per input row, then a hash aggregate) paid
    // ~4.7 s at sf0.1 generating 20 M rows; the same multiply-adds in
    // a tight loop over long arrays are ~100× cheaper. Exactness is
    // unchanged: partials are exact longs (flushed every 2¹⁶ rows so
    // |partial| ≤ 2¹⁶·(8·10⁶)² stays far from 2⁶³ whatever the corpus
    // size), the cross-partition combine is an order-free DECIMAL sum,
    // and the final IEEE chain is identical — so the DuckDB oracle
    // replays the relational definition bit-for-bit.
    val partials = df.select(xm.as("_xm")).as[Array[Long]]
      .mapPartitions { it =>
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(Int, Int, Long)]
        var d = 0
        var sxy: Array[Long] = null
        var sx: Array[Long] = null
        var n = 0L
        var since = 0
        def flush(): Unit = if (d > 0 && (since > 0 || n > 0)) {
          var i = 0
          while (i < d) {
            var j = 0
            while (j < d) {
              out += ((i, j, sxy(i * d + j))); j += 1
            }
            out += ((i, -1, sx(i))); i += 1
          }
          out += ((-1, -1, n))
          java.util.Arrays.fill(sxy, 0L)
          java.util.Arrays.fill(sx, 0L)
          n = 0L; since = 0
        }
        while (it.hasNext) {
          val v = it.next()
          if (d == 0) {
            d = v.length
            sxy = new Array[Long](d * d)
            sx = new Array[Long](d)
          }
          var i = 0
          while (i < d) {
            val xi = v(i)
            // the flush-interval overflow proof assumes |xi| ≤ 8e6
            // micro-units (|component| ≤ 8.0): 65536·(8e6)² ≈ 4.3e18
            // stays under 2⁶³. Enforce it — a silent overflow would
            // corrupt the covariance, not crash
            if (xi > 8000000L || xi < -8000000L)
              throw new IllegalArgumentException(
                s"covarianceFixed: |component| must be <= 8.0 " +
                  s"(quantized |xi| <= 8e6), got $xi micro-units")
            sx(i) += xi
            var j = 0
            val row = i * d
            while (j < d) { sxy(row + j) += xi * v(j); j += 1 }
            i += 1
          }
          n += 1L; since += 1
          if (since == 65536) flush()
        }
        flush()
        out.iterator
      }.toDF("i", "j", "_v")
    // eager checkpoint of the ≤ (d²+d+1)-row combine: three consumers
    // (n, means, products) would otherwise each re-run the corpus
    // kernel — PlanAudit counted 4 parquet scans before this
    val agg = partials.groupBy(col("i"), col("j"))
      .agg(sum(col("_v").cast("decimal(38,0)")).as("_s"))
      .localCheckpoint()
    val nRow = agg.filter(col("i") === -1)
      .select(col("_s").cast("long").as("_n"))
    val sx = agg.filter(col("i") >= 0 && col("j") === -1)
      .select(col("i"), col("_s").as("_sx"))
    val s2 = scale.toDouble * scale
    agg.filter(col("j") >= 0)
      .join(broadcast(sx), Seq("i"))
      .join(broadcast(sx.select(col("i").as("j"),
        col("_sx").as("_sxj"))), Seq("j"))
      .join(broadcast(nRow))
      .select(col("i"), col("j"),
        // `+ 0.0` normalizes IEEE signed zeros (−0.0 + 0.0 = +0.0):
        // DuckDB's round(x, 6) can yield −0.0 where this chain yields
        // +0.0 (driver r10: 2/4096 cells hash-diverged on rendering,
        // invisible to pandas `!=`). Both the oracle's cv CTE and this
        // select normalize, so the rendered texts agree bit-for-bit.
        (round(col("_s").cast("double") / col("_n") / s2 -
          (col("_sx").cast("double") / col("_n") / scale) *
            (col("_sxj").cast("double") / col("_n") / scale),
          6) + lit(0.0)).as("cov"))
  }

  /** Principal direction of a [[covarianceFixed]] matrix by FIXED-POINT
    * power iteration — `iters` rounds of matvec + L∞ normalization,
    * entirely in exact integer arithmetic (trunc-toward-zero division,
    * Spark `div` == DuckDB `//`), so the result is bit-replayable and
    * partition-order-independent. Output (i, v_nano): the direction
    * with L∞ norm = 10⁹ (sign fixed by the all-ones start).
    *
    * Overflow staging: cov quantizes to micro (≤ ~10⁸ for any
    * normalized embedding space — require-guarded), v is nano-bounded,
    * so each matvec term ≤ 10¹⁷ and a d ≤ 64 row-sum stays far from
    * 2⁶³; the normalize first right-sizes by q = m div 10⁹ + 1 (exact,
    * loses only sub-nano bits) before the ·10⁹ rescale.
    *
    * 100 TB shape: runs on the d²-row matrix, never the corpus — every
    * iteration is a d-keyed join + aggregate with 1-row broadcast
    * bounds; nothing touches the driver.
    */
  def pcaPowerTop(cov: DataFrame, iters: Int, dim: Int): DataFrame = {
    require(iters >= 1, s"pcaPowerTop: iters must be >= 1, got $iters")
    val covm = cov.select(col("i"), col("j"),
      round(col("cov") * 1000000L).cast("long").as("_c"))
      .localCheckpoint()
    // bounded probe of the d²-row matrix (not the corpus): the matvec
    // term bound 10¹⁷ needs |cov_micro| ≤ ~10⁸
    val mx = covm.agg(coalesce(max(abs(col("_c"))), lit(0L)))
      .head.getLong(0)
    require(mx <= 200000000L,
      s"pcaPowerTop: |cov| too large for the fixed-point staging ($mx)")
    var v: DataFrame = cov.sparkSession.range(dim)
      .select(col("id").cast("int").as("i"),
        lit(1000000000L).as("v_nano"))
    for (_ <- 1 to iters) {
      val w = covm
        .join(v.select(col("i").as("j"), col("v_nano")), Seq("j"))
        .groupBy(col("i"))
        .agg(sum(col("_c") * col("v_nano")).as("_w"))
      val m = w.agg(greatest(max(abs(col("_w"))), lit(1L)).as("_m"))
      val u = w.join(broadcast(m))
        .select(col("i"),
          expr("_w div (_m div 1000000000 + 1)").as("_u"))
      val m2 = u.agg(greatest(max(abs(col("_u"))), lit(1L)).as("_m2"))
      // checkpoint per iteration (the pageRank/connectedComponents loop
      // contract): m and the next matvec each re-reference this frame,
      // so an unmaterialized v would re-execute every PRIOR iteration
      // ~4× per level — exponential plan growth on tiny data
      v = u.join(broadcast(m2))
        .select(col("i"), expr("(_u * 1000000000) div _m2").as("v_nano"))
        .localCheckpoint()
    }
    v
  }

  /** Project every embedding onto a [[pcaPowerTop]] direction:
    * proj_micro = (Σᵢ vᵢ·round(xᵢ·10⁶)) div 10⁹ — exact integer
    * arithmetic end-to-end, so the 1-D curation coordinate (for
    * curriculum sort, stratified pruning, outlier cuts) is engine- and
    * partition-exact.
    *
    * 100 TB shape: the direction collapses to d literal longs in the
    * scan expression (the k-center literal-centers class — a d-row
    * bounded collect, never the corpus), so the projection is ONE
    * shuffle-free corpus scan: a zip_with product + aggregate fold per
    * row. The former posexplode + doc-keyed aggregate form paid a
    * corpus×d-row shuffle for the same exact integer sum (long adds
    * are order-free, so the fold and the shuffle agree bit-for-bit).
    */
  def pcaProject(df: DataFrame, idCol: String, vecCol: String,
      direction: DataFrame, scale: Long = 1000000L): DataFrame = {
    val dir = direction
      .select(col("i").cast("int"), col("v_nano").cast("long"))
      .collect().map(r => r.getInt(0) -> r.getLong(1))
      .sortBy(_._1).map(_._2)
    val dLit = array(dir.map(lit(_)): _*)
    val xm = transform(col(vecCol),
      e => round(e.cast("double") * scale).cast("long"))
    // coalesce keeps the old inner-join semantics at a length
    // mismatch: components without a direction entry (and vice versa)
    // contribute nothing
    val prods = zip_with(xm, dLit, (x, v) => coalesce(x * v, lit(0L)))
    df.select(col(idCol),
        aggregate(prods, lit(0L), (acc, p) => acc + p).as("_s"))
      .select(col(idCol), expr("_s div 1000000000").as("proj_micro"))
  }

  /** Greedy k-center selection (Gonzalez 1985 farthest-point traversal,
    * the 2-approximation): pick the minimum-id row as the first center,
    * then `k−1` times pick the row FARTHEST from the already-selected
    * set (max over rows of min sq-dist to the centers, ties to the
    * LOWER id). The coreset/diversity-selection primitive: where
    * [[clusterCap]] thins dense regions relative to fixed centroids,
    * k-center picks the cover itself — the selected rows are maximally
    * spread, and the max assignment distance is within 2× of the
    * optimal k-center radius. Used for "pick k maximally-diverse
    * examples" (seed sets for labeling, eval probes, prompt exemplars).
    *
    * Determinism: every distance is the codegen'd FLOAT-subtract /
    * DOUBLE-accumulate fold of [[graft.functions.VectorExpressions
    * .floatSqDist]] — bit-exact cross-engine (the sqDistSql pin) — and
    * both argmax and the later argmin break ties on exact values, so
    * the selection replays bit-for-bit in a SQL oracle.
    *
    * 100 TB shape: k iterations, each ONE codegen'd scan (distances to
    * ≤ k literal centers) + a 1-row TakeOrdered argmax — the sanctioned
    * bounded-collect class (BpeTrainer's per-merge argmax). No shuffle,
    * no broadcast beyond the k·dim literals in the scan expression.
    * Cost is k corpus scans: for large k pre-thin with hashSample or
    * run over cluster representatives ([[seedCentroids]] +
    * [[clusterAssign]] reps), the standard composed form.
    *
    * Degenerate note: if the corpus has fewer than k distinct vectors,
    * all residual distances hit 0 and the argmax (ties to lower id)
    * re-selects an existing center; callers wanting hard uniqueness
    * should dedup vectors upstream (exact dedup on the vector bytes).
    */
  def kcenterTrain(df: DataFrame, idCol: String, vecCol: String,
      k: Int): Seq[(Long, Array[Float])] = {
    require(k >= 1, s"kcenterTrain: k must be >= 1, got $k")
    def take1(d: DataFrame): (Long, Array[Float]) = {
      val r = d.limit(1).collect().headOption // bounded: 1 row per iteration
        .getOrElse(throw new IllegalArgumentException(
          "kcenterTrain: empty input — need at least one vector row"))
      (r.getLong(0), r.getSeq[Float](1).toArray)
    }
    val first = take1(df.select(col(idCol).cast("long"), col(vecCol))
      .orderBy(col(idCol)))
    var centers = Vector(first)
    while (centers.size < k) {
      val far = take1(df
        .withColumn("_d", minDistTo(col(vecCol), centers.map(_._2)))
        .select(col(idCol).cast("long"), col(vecCol), col("_d"))
        .orderBy(col("_d").desc, col(idCol)))
      centers = centers :+ far
    }
    centers
  }

  /** Assignment half of [[kcenterTrain]]: every row → the rank (selection
    * order) and id of its nearest selected center, plus the covering
    * distance as floor(d·10⁶) micro-units (the fold is bit-exact, so the
    * floor is too). Ties go to the EARLIER-selected center. Pure
    * codegen'd scan — zero shuffle, streams as-is.
    */
  def kcenterAssign(df: DataFrame, idCol: String, vecCol: String,
      centers: Seq[(Long, Array[Float])]): DataFrame = {
    val dists = array(centers.map(c =>
      graft.functions.VectorExpressions.floatSqDist(
        col(vecCol), array(c._2.toIndexedSeq.map(lit(_)): _*))): _*)
    val ids = array(centers.map(c => lit(c._1)): _*)
    df.withColumn("_cd", dists)
      .withColumn("center_rank",
        (array_position(col("_cd"), array_min(col("_cd"))) - 1)
          .cast("int"))
      .withColumn("center_id",
        element_at(ids, col("center_rank") + 1))
      .withColumn("d_micro",
        floor(array_min(col("_cd")) * 1000000d).cast("long"))
      .drop("_cd")
  }

  /** One-call k-center: train on the input, assign the input. */
  def kcenter(df: DataFrame, idCol: String, vecCol: String, k: Int)
      : DataFrame =
    kcenterAssign(df, idCol, vecCol, kcenterTrain(df, idCol, vecCol, k))

  /** Margin-criterion pair mining (Artetxe & Schwenk 2019 — the LASER
    * bitext-mining scorer): absolute cosine misfires under hubness, so
    * each candidate pair (x, y) scores RELATIVE to its neighborhoods —
    * margin = cos(x,y) / ((avgᵏfwd(x) + avgᵏbwd(y)) / 2). Mined pairs
    * are each src row with its best tgt match, the margin in exact ppm,
    * and a mutual-best flag — the parallel-corpus mining / cross-corpus
    * alignment primitive.
    *
    * Determinism: every cosine is the bit-exact FLOAT fold, truncated
    * ONCE to floor(cos·10⁹) nano longs; neighborhood sums are exact
    * long adds over the rank-cut top-k (ties (sim desc, id)), and
    * margin_ppm = c_nano·2k·10⁶ div (Σfwd + Σbwd) — trunc division, so
    * the whole mining replays bit-for-bit in SQL. Pairs whose
    * denominator is ≤ 0 (pathological all-negative neighborhoods) are
    * dropped, documented.
    *
    * 100 TB shape: the yardstick form scores src×tgt once per
    * direction (src broadcast, guarded — the bruteTopK contract). The
    * scored pair table is deliberately NOT persisted: it is
    * |src|·|tgt| rows, so a MEMORY_AND_DISK materialization writes
    * and re-reads gigabytes where recomputing the broadcast-scan dot
    * is compute-cheap and embarrassingly parallel (measured at sf1:
    * the persisted form blew the 150 s bench cap; unpersisted, the
    * family runs with the other quadratic-by-spec yardsticks). Both
    * rank cuts are `row_number ≤ k` windows — the WindowGroupLimit
    * partial top-k keeps each shuffle at ~k rows per key per map
    * partition, not the full pair table. The final pair rows REUSE
    * the forward rank-1 rows (they ARE the best-match pairs) instead
    * of re-scanning the scored table a third time. Corpus-sized
    * mining generates candidates with [[VectorOps.annTopK]]'s bucket
    * join per direction and applies the same nano/margin arithmetic
    * on the survivors.
    */
  def marginPairs(src: DataFrame, tgt: DataFrame, idCol: String,
      vecCol: String, k: Int, thresholdPpm: Long,
      maxSrcRows: Long = 100000L): DataFrame = {
    require(k >= 1, s"marginPairs: k must be >= 1, got $k")
    val nSrc = src.count()
    require(nSrc <= maxSrcRows,
      s"marginPairs src side has $nSrc rows (max $maxSrcRows): too " +
        "large to broadcast — generate candidates with annTopK upstream")
    val q = src.select(col(idCol).as("src_id"), col(vecCol).as("_sv"))
      .withColumn("_sn", VectorOps.norm(col("_sv")))
    // materialized target norms (the bruteTopK rule)
    val c = VectorOps.matStream(
      tgt.select(col(idCol).as("tgt_id"), col(vecCol).as("_tv"))
        .withColumn("_tn", VectorOps.norm(col("_tv"))))
    // `scored` is a def ON PURPOSE: the |src|·|tgt| subtree is cheap to
    // recompute (one dot per pair over the checkpointed norms) and too
    // big to persist. The forward window, backward window, and the
    // fwd-rank-1 reuse path each re-derive it unless Spark's exchange
    // reuse kicks in — a measured 2-3× recompute that beats the
    // persisted form at sf1. Callers whose vectors are expensive
    // relative to IO (e.g. very high dims on slow storage) can
    // `.persist()` their OWN src/tgt inputs before calling; the pair
    // table itself must stay unpersisted.
    def scored = c.crossJoin(broadcast(q))
      .withColumn("c_nano",
        floor(VectorOps.dot(col("_sv"), col("_tv"))
          / (col("_sn") * col("_tn")) * 1000000000d).cast("long"))
      .select(col("src_id"), col("tgt_id"), col("c_nano"))
    val fw = Window.partitionBy(col("src_id"))
      .orderBy(col("c_nano").desc, col("tgt_id"))
    val fwd = scored.withColumn("_r", row_number().over(fw))
      .filter(col("_r") <= k)
    val fwdAgg = fwd.groupBy(col("src_id"))
      .agg(sum(col("c_nano")).as("_afn"),
        min(when(col("_r") === 1, col("tgt_id"))).as("_best_tgt"))
    val bw = Window.partitionBy(col("tgt_id"))
      .orderBy(col("c_nano").desc, col("src_id"))
    val bwd = scored.withColumn("_r", row_number().over(bw))
      .filter(col("_r") <= k)
    val bwdAgg = bwd.groupBy(col("tgt_id"))
      .agg(sum(col("c_nano")).as("_abn"),
        min(when(col("_r") === 1, col("src_id"))).as("_best_src"))
    // the (src, best tgt) pair rows ARE the forward rank-1 rows — no
    // third scan of the scored table
    fwd.filter(col("_r") === 1).drop("_r")
      .join(fwdAgg, Seq("src_id"))
      .join(bwdAgg, Seq("tgt_id"))
      .filter(col("_afn") + col("_abn") > 0)
      .withColumn("margin_ppm",
        expr(s"(c_nano * ${2L * k} * 1000000) div (_afn + _abn)"))
      .filter(col("margin_ppm") >= thresholdPpm)
      .withColumn("mutual", col("_best_src") === col("src_id"))
      .select(col("src_id"), col("tgt_id"), col("c_nano"),
        col("margin_ppm"), col("mutual"))
  }

  /** min over `cents` of the exact FLOAT sq-dist fold — shared by the
    * k-center train/assign scans.
    */
  private def minDistTo(vec: Column, cents: Seq[Array[Float]]): Column =
    array_min(array(cents.map(c =>
      graft.functions.VectorExpressions.floatSqDist(
        vec, array(c.toIndexedSeq.map(lit(_)): _*))): _*))

  /** Shared tail of the kNN-label family: rank each query's scored
    * candidates, keep `k`, majority-vote the neighbour labels (more
    * votes first, then the LOWER label — fully deterministic).
    */
  private def voteMajority(scored: DataFrame, idCol: String, k: Int)
      : DataFrame = {
    val nnW = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col(idCol))
    val nn = scored.withColumn("_r", row_number().over(nnW))
      .filter(col("_r") <= k)
    val votes = nn.groupBy(col("q_id"), col("_nl"))
      .agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("votes").desc, col("_nl"))
    votes.withColumn("_r", row_number().over(w))
      .filter(col("_r") === 1)
      .select(col("q_id"), col("_nl").as("label"),
        col("votes").cast("int").as("votes"))
  }
}
