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

  /** Sequential-fold dot product: Σ a[i]*b[i], double accumulator.
    *
    * Backed by the codegen'd [[graft.functions.FloatDot]] expression —
    * bit-identical to the interpreted HOF fold
    * (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`, pinned by LlmSpec) but
    * a tight primitive loop inside whole-stage codegen: the HOF form
    * allocates lambda slots per element and dominated every similarity
    * join's inner loop (dedup_cosine_exact: 21.8 s → sub-second at sf0.1).
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.floatDot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Symmetric int8 scalar quantization — the ANN memory-scale path
    * (4 bytes/dim float → 1 byte/dim + one scale): per-vector
    * scale = max|v|/127, q_i = floor(v_i/scale + 0.5) (explicit
    * floor(x+0.5) so no engine-specific rounding mode leaks in;
    * a zero vector quantizes to zeros). Pure per-row arithmetic in
    * whole-stage codegen — no shuffle, embarrassingly parallel.
    */
  def quantizeInt8(df: DataFrame, vecCol: String): DataFrame =
    df.withColumn("q_scale",
        array_max(transform(col(vecCol), x => abs(x.cast("double")))) / 127.0)
      .withColumn("q_vec", transform(col(vecCol), x =>
        when(col("q_scale") === 0.0, lit(0L))
          .otherwise(floor(x.cast("double") / col("q_scale") + 0.5)
            .cast("long"))))

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

  /** Matryoshka truncation (MRL serving): keep the first `dims`
    * components and re-normalize to unit length — the cheap-retrieval
    * trick for nested-representation embeddings (coarse search on the
    * prefix, full-dim re-rank on survivors). Per-row expression, zero
    * shuffle; the truncated array is materialized in its own projection
    * (interpreted HOFs re-evaluate inline subtrees).
    */
  def matryoshka(df: DataFrame, vecCol: String, dims: Int,
      as: String = "m_vec"): DataFrame = {
    require(dims >= 1, s"matryoshka: dims must be positive, got $dims")
    df.withColumn("_mt", slice(col(vecCol), 1, dims))
      .withColumn("_mn", norm(col("_mt")))
      .withColumn(as, transform(col("_mt"), x => x / col("_mn")))
      .drop("_mt", "_mn")
  }

  /** Sign-bit binarization: bit i of the result long is set iff
    * component i+1 is positive — a 1-long-per-row binary sketch
    * (≈1/256 the footprint of a 64-float vector) whose Hamming
    * distance tracks angular distance. `dims` ≤ 62 keeps the packed
    * value in non-negative long range; 2^i is exact in binary64, so
    * the oracle replays the identical packing.
    */
  def signBits(vec: Column, dims: Int): Column = {
    require(dims >= 1 && dims <= 62,
      s"signBits: dims must be in [1, 62], got $dims")
    aggregate(sequence(lit(0), lit(dims - 1)), lit(0L),
      (acc, i) => acc + when(element_at(vec, i + 1) > lit(0f),
        pow(lit(2.0), i).cast("long")).otherwise(lit(0L)))
  }

  /** Materialize a broadcast-scan's STREAM side: spread a narrow input
    * across the session's default parallelism first — a small side read
    * from one parquet file otherwise runs the whole |stream|×|broadcast|
    * per-pair loop on ONE core (measured: the sf1 all-pairs yardsticks
    * blew the 150 s bench cap single-partitioned; spread, the same
    * work rides every core) — then localCheckpoint (the
    * defer-into-the-match-loop rule). The repartition is skipped when
    * the input is already wider, so the 100 TB path pays no extra
    * shuffle; per-pair math downstream is partition-order-exact by
    * every caller's contract.
    */
  private[graft] def matStream(df: DataFrame): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    (if (df.rdd.getNumPartitions < want) df.repartition(want) else df)
      .localCheckpoint()
  }

  /** Hamming top-k over [[signBits]] sketches — the binary-sketch ANN
    * yardstick: exact top-k by bit distance, [[bruteTopK]]'s guarded
    * broadcast shape (queries must be small; the corpus side carries
    * ONE long per row past the binarization scan, so even the
    * all-pairs fallback moves 8 bytes/row). The 100 TB production
    * path remains [[annTopK]]/[[ivfTopK]] candidates re-ranked on full
    * vectors; this is the cheap first-pass filter.
    */
  def hammingTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      dims: Int = 62,
      maxQueryRows: Long = MaxBroadcastQueries): DataFrame = {
    val qCount = queries.count()
    require(qCount <= maxQueryRows,
      s"hammingTopK query side has $qCount rows (max $maxQueryRows): " +
        "too large to broadcast — use annTopK, or raise maxQueryRows")
    val q = queries.select(col(idCol).as("q_id"),
      signBits(col(vecCol), dims).as("_qb"))
    // materialized binary sketch (the pqTopKWithBooks rule: under the
    // broadcast join, un-checkpointed signBits re-ran per pair) — one
    // long per corpus row, the persisted first-pass index
    val c = matStream(
      corpus.select(col(idCol), signBits(col(vecCol), dims).as("_cb")))
    hammingArm(c, q, idCol, k)
  }

  /** The Hamming scoring arm over a PREPARED corpus frame (must carry
    * `_cb`; extra columns ride along and are dropped by the final
    * select) and a prepared query frame (`q_id`, `_qb`). Split out so
    * composed queries ([[hybridTopK]], [[hammingRerank]]) share ONE
    * materialized corpus across their arms instead of checkpointing
    * the corpus once per arm — the round-13 matStream fixed overhead
    * that doubled sub-second composites at sf0.1.
    */
  private def hammingArm(c: DataFrame, q: DataFrame, idCol: String,
      k: Int): DataFrame = {
    val scored = c.crossJoin(broadcast(q))
      .filter(col(idCol) =!= col("q_id"))
      .withColumn("ham",
        bit_count(col("_qb").bitwiseXOR(col("_cb"))).cast("int"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("ham"), col(idCol))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk").cast("int").as("rnk"), col(idCol),
        col("ham"))
  }

  /** The dense exact-cosine scoring arm over a PREPARED corpus frame
    * (must carry the vector column and `_cn`) and a prepared query
    * frame (`q_id`, `q_vec`, `_qn`). See [[hammingArm]] for why the
    * arms are split from their prepare steps.
    */
  private def denseArm(c: DataFrame, q: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val scored = c.crossJoin(broadcast(q))
      .filter(col(idCol) =!= col("q_id"))
      .withColumn("sim",
        dot(col(vecCol), col("q_vec")) / (col("_cn") * col("_qn")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc,
      col(idCol))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col(idCol),
        round(col("sim"), 6).as("sim"))
  }

  /** Hybrid dense+binary retrieval over ONE shared materialized corpus
    * AND one corpus pass: both scores (exact cosine + Hamming) come off
    * a single crossJoin(broadcast(queries)), both per-arm ranks are
    * windows over the SAME q_id partitioning (one shuffle, two sorts),
    * and — because every (q_id, id) pair appears exactly once in that
    * join — the [[Fusion.rrfFuse]] combination degenerates to a
    * PROJECTION: `rrf_nano = Σ_arm (rank ≤ k ? Nano div (c + rank) : 0)`
    * with no unionByName and no (q_id, id) re-aggregation shuffle.
    * Bit-identical to fusing the two arms through rrfFuse (same score
    * expressions, same integer contributions, same (rrf_nano desc, id)
    * cut — the r13 two-arm form is the A/B yardstick in VectorSpec);
    * measured 1.5 → ~1.0 s at sf0.1 because the composite drops a
    * second corpus-sized broadcast join, the union and the fuse
    * aggregation. [[Fusion.rrfFuse]] remains the general N-list
    * combiner for rankings that arrive from DIFFERENT retrieval paths
    * (BM25 + dense, per-query batches) where the single-join
    * specialization doesn't apply.
    */
  def hybridTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      c: Int = 60,
      dims: Int = 62,
      maxQueryRows: Long = MaxBroadcastQueries): DataFrame = {
    val qCount = queries.count()
    require(qCount <= maxQueryRows,
      s"hybridTopK query side has $qCount rows (max $maxQueryRows): " +
        "too large to broadcast — use annTopK, or raise maxQueryRows")
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
      .withColumn("_qn", norm(col("q_vec")))
      .withColumn("_qb", signBits(col("q_vec"), dims))
    val corp = matStream(corpus.select(col(idCol), col(vecCol))
      .withColumn("_cn", norm(col(vecCol)))
      .withColumn("_cb", signBits(col(vecCol), dims)))
    val scored = corp.crossJoin(broadcast(q))
      .filter(col(idCol) =!= col("q_id"))
      .withColumn("sim",
        dot(col(vecCol), col("q_vec")) / (col("_cn") * col("_qn")))
      .withColumn("ham",
        bit_count(col("_qb").bitwiseXOR(col("_cb"))).cast("int"))
    val wd = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col(idCol))
    val wh = Window.partitionBy(col("q_id"))
      .orderBy(col("ham"), col(idCol))
    val N = Fusion.Nano
    val fused = scored
      .withColumn("_rd", row_number().over(wd))
      .withColumn("_rh", row_number().over(wh))
      .filter(col("_rd") <= k || col("_rh") <= k)
      .select(col("q_id"), col(idCol).as("id"),
        (expr(s"CASE WHEN _rd <= $k THEN $N div ($c + _rd) " +
          "ELSE CAST(0 AS BIGINT) END") +
          expr(s"CASE WHEN _rh <= $k THEN $N div ($c + _rh) " +
            "ELSE CAST(0 AS BIGINT) END")).as("rrf_nano"),
        ((col("_rd") <= k).cast("long") + (col("_rh") <= k).cast("long"))
          .as("n_lists"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("rrf_nano").desc, col("id"))
    fused.withColumn("rnk", row_number().over(w).cast("int"))
      .filter(col("rnk") <= k)
  }

  /** The composed binary-sketch retrieval pipeline: [[hammingTopK]]
    * takes a wide top-`candidates` cut (8-bytes-per-row first pass),
    * then the survivors re-rank by EXACT cosine — the two-stage shape a
    * 100 TB serving path actually runs (cheap filter over everything,
    * expensive metric over a bounded candidate set). The re-rank join
    * touches `candidates` rows per query, never the corpus.
    */
  def hammingRerank(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      candidates: Int,
      dims: Int = 62): DataFrame = {
    require(candidates >= k,
      s"hammingRerank: candidates ($candidates) must be >= k ($k)")
    val qCount = queries.count()
    require(qCount <= MaxBroadcastQueries,
      s"hammingRerank query side has $qCount rows (max " +
        s"$MaxBroadcastQueries): too large to broadcast — use annTopK")
    // ONE materialized corpus shared by both stages: the Hamming pass
    // reads `_cb`, the re-rank join reads (vec, `_cn`) off the same
    // checkpoint — previously the re-rank re-scanned parquet and
    // re-derived norms beside a second per-arm checkpoint.
    val corp = matStream(corpus.select(col(idCol), col(vecCol))
      .withColumn("_cn", norm(col(vecCol)))
      .withColumn("_cb", signBits(col(vecCol), dims)))
    val qb = queries.select(col(idCol).as("q_id"),
      signBits(col(vecCol), dims).as("_qb"))
    val cand = hammingArm(corp, qb, idCol, candidates)
      .select(col("q_id"), col(idCol))
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("_qv"))
      .withColumn("_qn", norm(col("_qv")))
    val scored = cand
      .join(corp.select(col(idCol), col(vecCol), col("_cn")), idCol)
      .join(broadcast(q), "q_id")
      .withColumn("sim",
        dot(col(vecCol), col("_qv")) / (col("_cn") * col("_qn")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc,
      col(idCol))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk").cast("int").as("rnk"), col(idCol),
        round(col("sim"), 6).as("sim"))
  }

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
    // one dot product + one divide. The corpus side is MATERIALIZED
    // (localCheckpoint): under the broadcast join, codegen would defer
    // the norm fold into the per-match loop and re-run it per PAIR —
    // the SCALE.md materialize-before-broadcast-join rule; measured
    // 15.2 s → 9.2 s at sf1 (200 q × 20 k). One extra in-memory corpus
    // copy, acceptable by this operator's guarded/sampled contract.
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
      .withColumn("_qn", norm(col("q_vec")))
    val c = matStream(corpus.select(col(idCol), col(vecCol))
      .withColumn("_cn", norm(col(vecCol))))
    denseArm(c, q, idCol, vecCol, k)
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

  /** Deterministic Achlioptas-style projection signs: component
    * (out dim j, in dim i) ∈ {−1, +1} from the parity of
    * md5("rproj_j_i")'s first byte. Driver-side once, shipped as
    * literals — same scheme as [[planes]], so the DuckDB oracle replays
    * the exact matrix.
    */
  def rprojSigns(k: Int, dim: Int): Seq[Array[Float]] = {
    val mdig = java.security.MessageDigest.getInstance("MD5")
    (0 until k).map { j =>
      Array.tabulate(dim) { i =>
        val b = mdig.digest(s"rproj_${j}_$i".getBytes("UTF-8"))(0)
        if ((b & 1) == 0) 1.0f else -1.0f
      }
    }
  }

  /** Johnson–Lindenstrauss random projection: out_j = (v · s_j)/√k with
    * the ±1 sign rows of [[rprojSigns]] (Achlioptas 2003 — ±1 entries
    * preserve pairwise distances like Gaussians, and stay exactly
    * representable as float literals). The dimensionality-reduction
    * scale path for similarity search: 64→k dims cuts every downstream
    * distance computation and index footprint by 64/k at a bounded
    * distortion. Per-row codegen'd [[dot]] folds, zero shuffle.
    */
  def randomProject(df: DataFrame, vecCol: String, k: Int, dim: Int,
      prefix: String = "p"): DataFrame = {
    val inv = 1.0 / math.sqrt(k.toDouble)
    rprojSigns(k, dim).zipWithIndex.foldLeft(df) { case (d, (s, j)) =>
      d.withColumn(f"$prefix$j%02d",
        dot(col(vecCol), array(s.toIndexedSeq.map(lit(_)): _*)) * inv)
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

  /** ANN recall@k report — the measurement behind every recall-knob
    * sentence in SCALE.md: per query, how many of the EXACT top-k the
    * ANN ladder actually returned. This is the tuning loop's
    * instrument (pick nPlanes/probes by measured recall on a sampled
    * query set, then deploy those knobs corpus-wide), so it ships as
    * an operator, not a notebook ritual. Recall compares MEMBERSHIP
    * (id sets), never float scores, so the report is exact integer
    * end-to-end: `recall_milli = hits·1000 div n_exact`.
    *
    * 100 TB shape: run over a SAMPLED query set (the bruteTopK guard
    * enforces the broadcast bound) — the exact side is the quadratic
    * yardstick priced per query, the ANN side is the production path;
    * the comparison itself is one (q_id, id) equi-join over k-bounded
    * rank rows. Emits `(q_id, k, n_exact, hits, recall_milli)`.
    */
  def annRecallReport(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nPlanes: Int = 8,
      dim: Int = 64,
      probes: Int = 1): DataFrame = {
    val an = annTopK(corpus, queries, idCol, vecCol, k, nPlanes, dim,
      probes).select(col("q_id").as("_q2"), col(idCol).as("_id2"))
    // scope-cache the exact side: it feeds both the per-query
    // denominator and the hit join (PlanAudit rule)
    graft.core.CacheScope.withPersisted(
      bruteTopK(corpus, queries, idCol, vecCol, k)
        .select(col("q_id"), col(idCol))) { ex =>
      val nx = ex.groupBy(col("q_id")).agg(count(lit(1)).as("n_exact"))
      val ht = ex.join(an, col("q_id") === col("_q2") &&
          col(idCol) === col("_id2"))
        .groupBy(col("q_id")).agg(count(lit(1)).as("hits"))
      nx.join(ht, Seq("q_id"), "left")
        .select(col("q_id"), lit(k).as("k"), col("n_exact"),
          coalesce(col("hits"), lit(0L)).as("hits"))
        .withColumn("recall_milli",
          expr("(hits * 1000) div n_exact"))
    }
  }

  // ---- embedding-cosine near-duplicates ----------------------------------

  /** Banded sign-bit LSH near-duplicate pairs over an embedding column —
    * the embedding-space analog of
    * [[graft.operators.text.Dedup.nearDupPairs]]: random-hyperplane
    * (SimHash-style) banding instead of MinHash banding, exact cosine
    * instead of exact Jaccard as the verify metric.
    *
    * Each row gets `bands` bucket ids of `rowsPerBand` sign bits over the
    * deterministic [[planes]] (plane j is the same array for every caller,
    * so band b of a (bands = 2) run is IDENTICAL to band b of a
    * (bands = 4) run — candidate sets nest and recall is monotone in
    * `bands`). A pair sharing ANY band bucket becomes a candidate; exact
    * cosine >= threshold verifies, so precision is exact and only recall
    * is approximate: recall = 1 - (1 - p^r)^b with p = 1 - acos(sim)/pi
    * (~0.95 at sim 0.9 under the 4x4 default). Cost grows linearly in
    * `bands` — each band is one more shuffle-partitionable bucket
    * equi-join, never all-pairs.
    *
    * Same 100 TB discipline as the text form: per-(band, bucket) cap
    * applied BEFORE the self-join (rank by id, deterministic), vectors +
    * norms materialized once and reused by banding and both verify sides.
    */
  def cosineDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      bands: Int = 4,
      rowsPerBand: Int = 4,
      dim: Int = 64,
      maxBucketSize: Int = 4096): DataFrame = {
    val ps = planes(bands * rowsPerBand, dim)
    val base0 = df.select(col(idCol).as("_id"), col(vecCol).as("_v"))
      .withColumn("_n", norm(col("_v")))
    // base persisted only for the duration of the call ([[CacheScope]]):
    // the pair output is orders of magnitude smaller than the corpus
    graft.core.CacheScope.withPersisted(base0) { base =>
      // one materialized projection array feeds every band's bucket id
      val bandStructs = array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          (0 until rowsPerBand).map { j =>
            when(element_at(col("_dots"), b * rowsPerBand + j + 1) > 0,
              lit(1L << j)).otherwise(lit(0L))
          }.reduce(_ + _).as("bh"))
      }: _*)
      val bandRows = base.withColumn("_dots", planeDots(col("_v"), ps))
        .select(col("_id"), explode(bandStructs).as("_bb"))
        .select(col("_id"), col("_bb.band").as("band"), col("_bb.bh").as("bh"))
      // cap BEFORE the self-join — the quadratic blowup happens while the
      // join enumerates matches, so post-join filtering would be too late
      val w = Window.partitionBy(col("band"), col("bh")).orderBy(col("_id"))
      val capped = bandRows.withColumn("_r", row_number().over(w))
        .filter(col("_r") <= maxBucketSize).drop("_r")
      val l = capped.select(col("band"), col("bh"), col("_id").as("a"))
      val r = capped.select(col("band").as("band_r"), col("bh").as("bh_r"),
        col("_id").as("b"))
      val cand = l.join(r,
          col("band") === col("band_r") && col("bh") === col("bh_r") &&
            col("a") < col("b"))
        .select("a", "b").distinct()
      verifyCosine(cand, base, threshold)
    }
  }

  /** [[cosineDupPairs]] with the signature width SIZED FROM THE CORPUS:
    * r = ceil(log2(n / targetBucketRows)), clamped to [4, 24]. The sf1
    * scale run (BENCH_NOTES_r9 §3) measured the occupancy law directly —
    * at fixed signature width candidate pairs grow ~n²/2^r per band, so
    * a 10× corpus under the default 4-bit bands went 39.6× in
    * wall-clock; re-bounding occupancy (8 bits) restored near-linear
    * time. This wrapper spends ONE count job (the same sanctioned bound
    * check [[bruteTopK]] uses) to apply docs/SCALE.md's rule
    * automatically; buy recall back at the target similarity with
    * `bands`, which stays linear in cost. The fixed-parameter form
    * remains the oracle surface (the DuckDB twin replays exact planes).
    */
  def cosineDupPairsAuto(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      bands: Int = 4,
      dim: Int = 64,
      targetBucketRows: Int = 128,
      maxBucketSize: Int = 4096): DataFrame = {
    val n = math.max(df.count(), 1L)
    val r = autoBits(n, targetBucketRows)
    cosineDupPairs(df, idCol, vecCol, threshold, bands, r, dim, maxBucketSize)
  }

  /** Smallest r with 2^r ≥ ceil(n / targetBucketRows), clamped to
    * [4, 24] — exposed for the spec's sizing pins. Pure integer
    * arithmetic (the simhash64AutoBandBits rule: a float ceil(log2)
    * can bump the width by 1 at exact powers of two).
    */
  def autoBits(n: Long, targetBucketRows: Int): Int = {
    val target = math.max(targetBucketRows, 1).toLong
    val buckets = math.max(1L, (n + target - 1L) / target)
    val needed = if (buckets <= 1L) 0
      else 64 - java.lang.Long.numberOfLeadingZeros(buckets - 1L)
    math.min(24, math.max(4, needed))
  }

  /** Exact all-pairs cosine near-duplicates — [[cosineDupPairs]]'s exact
    * twin, same contract as [[bruteTopK]]: quadratic BY SPEC, so the
    * smaller broadcastable side is guarded eagerly. The LSH-banded form is
    * the scale path; this is the oracle-exact answer for bounded corpora.
    */
  def cosineDupPairsExact(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      maxRows: Long = MaxBroadcastQueries): DataFrame = {
    val n = df.count()
    require(n <= maxRows,
      s"cosineDupPairsExact corpus has $n rows (max $maxRows): all-pairs " +
        "is quadratic — use cosineDupPairs (LSH-banded), or raise maxRows")
    // materialized + spread norms (the matStream rule: un-checkpointed,
    // the norm fold deferred into the per-pair loop AND the whole
    // n²/2-pair scan ran on the narrow input's single partition)
    val base = matStream(
      df.select(col(idCol).as("_id"), col(vecCol).as("_v"))
        .withColumn("_n", norm(col("_v"))))
    val l = base.select(col("_id").as("a"), col("_v").as("_va"),
      col("_n").as("_na"))
    val r = base.select(col("_id").as("b"), col("_v").as("_vb"),
      col("_n").as("_nb"))
    l.join(broadcast(r), col("a") < col("b"))
      .withColumn("sim",
        round(dot(col("_va"), col("_vb")) / (col("_na") * col("_nb")), 6))
      .filter(col("sim") >= threshold)
      .select(col("a"), col("b"), col("sim"))
  }

  /** SemDeDup — semantic deduplication by cluster-then-dedup (Abbas et
    * al. 2023): partition the corpus into clusters, compare only within a
    * cluster, and drop every document whose cosine to a LOWER-ID
    * cluster-mate reaches `threshold`. Emits every input row with its
    * cluster id and a `kept` verdict.
    *
    * Clustering is sign-bit LSH over `bits` md5-derived hyperplanes
    * rather than trained k-means: deterministic, training-free, and
    * exactly replayable by the DuckDB oracle (same planes, same fold
    * order), so the correctness gate pins the whole algorithm. This is
    * the parallel-greedy variant — a doc is dropped against ANY lower-id
    * neighbour, kept or not, which needs no sequential chain through the
    * cluster (the sequential keep-only-vs-retained form is
    * order-dependent and serializes; at a fixed threshold the kept set
    * differs only on transitive chains a~b~c where a≁c).
    *
    * 100 TB shape: one shuffle on the cluster key; the within-cluster
    * self-join is bucket-local with the [[cosineDupPairs]] cap-BEFORE-
    * join hard stop; `bits` must grow with log₂(n) to hold occupancy
    * (docs/SCALE.md's rule — [[autoBits]] applies here unchanged).
    */
  def semDedup(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      bits: Int = 8,
      dim: Int = 64,
      maxClusterSize: Int = 4096): DataFrame = {
    val ps = planes(bits, dim)
    val base0 = df.select(col(idCol).as("_id"), col(vecCol).as("_v"))
      .withColumn("_n", norm(col("_v")))
      .withColumn("cluster", lshBucket(col("_v"), ps))
    graft.core.CacheScope.withPersisted(base0) { base =>
      val w = Window.partitionBy(col("cluster")).orderBy(col("_id"))
      val capped = base.withColumn("_r", row_number().over(w))
        .filter(col("_r") <= maxClusterSize).drop("_r")
      val l = capped.select(col("cluster"), col("_id").as("a"),
        col("_v").as("_va"), col("_n").as("_na"))
      val r = capped.select(col("cluster").as("_cr"), col("_id").as("b"),
        col("_v").as("_vb"), col("_n").as("_nb"))
      val dropped = l.join(r,
          col("cluster") === col("_cr") && col("a") < col("b"))
        .filter(round(dot(col("_va"), col("_vb")) /
          (col("_na") * col("_nb")), 6) >= threshold)
        .select(col("b").as("_id")).distinct()
        .withColumn("_dropped", lit(1))
      base.join(dropped, Seq("_id"), "left")
        .select(col("_id").as(idCol), col("cluster"),
          col("_dropped").isNull.as("kept"))
    }
  }

  /** Semantic decontamination — the embedding-space completion of the
    * decontamination ladder ([[graft.operators.text.Dedup]] catches
    * exact and paraphrased n-gram leakage; this catches REWRITES that
    * share no surface n-grams but embed next to an eval item): flag
    * every corpus row whose cosine to ANY benchmark row (marked by
    * `isBench`) reaches `threshold`. Same banded sign-bit LSH candidate
    * machinery as [[cosineDupPairs]], with the self-join replaced by a
    * corpus×benchmark cross-set join. Emits one row per NON-benchmark
    * doc: `(vec id, n_hits, max_sim, contaminated)` — the
    * [[graft.operators.text.Dedup.decontaminateFuzzy]] output contract.
    *
    * 100 TB shape: the benchmark side is eval-set-sized; both sides cap
    * per (band, bucket, side) BEFORE the join (the benchmark rows get
    * their own cap lane so a hot corpus bucket cannot squeeze them
    * out), candidates are bucket-bounded, and the verify is one
    * vector-keyed equi-join per side — no broadcast requirement, no
    * all-pairs path anywhere.
    */
  def semanticDecon(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      isBench: Column,
      threshold: Double,
      bands: Int = 4,
      rowsPerBand: Int = 4,
      dim: Int = 64,
      maxBucketSize: Int = 4096): DataFrame = {
    val ps = planes(bands * rowsPerBand, dim)
    val base0 = df.select(col(idCol).as("_id"), col(vecCol).as("_v"),
        isBench.as("_bench"))
      .withColumn("_n", norm(col("_v")))
    graft.core.CacheScope.withPersisted(base0) { base =>
      val bandStructs = array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          (0 until rowsPerBand).map { j =>
            when(element_at(col("_dots"), b * rowsPerBand + j + 1) > 0,
              lit(1L << j)).otherwise(lit(0L))
          }.reduce(_ + _).as("bh"))
      }: _*)
      val bandRows = base.withColumn("_dots", planeDots(col("_v"), ps))
        .select(col("_id"), col("_bench"), explode(bandStructs).as("_bb"))
        .select(col("_id"), col("_bench"),
          col("_bb.band").as("band"), col("_bb.bh").as("bh"))
      // cap per (band, bucket, SIDE) before the join — the bench side
      // must survive hot buckets independently of corpus volume
      val w = Window.partitionBy(col("band"), col("bh"), col("_bench"))
        .orderBy(col("_id"))
      val capped = bandRows.withColumn("_r", row_number().over(w))
        .filter(col("_r") <= maxBucketSize).drop("_r")
      val l = capped.filter(!col("_bench"))
        .select(col("band"), col("bh"), col("_id").as("a"))
      val r = capped.filter(col("_bench"))
        .select(col("band").as("band_r"), col("bh").as("bh_r"),
          col("_id").as("b"))
      val cand = l.join(r,
          col("band") === col("band_r") && col("bh") === col("bh_r"))
        .select("a", "b").distinct()
      val hits = verifyCosine(cand, base, threshold)
        .groupBy(col("a"))
        .agg(count(lit(1)).as("_nh"), max(col("sim")).as("_ms"))
      base.filter(!col("_bench")).select(col("_id").as(idCol))
        .join(hits, col(idCol) === col("a"), "left")
        .select(col(idCol),
          coalesce(col("_nh"), lit(0L)).as("n_hits"),
          coalesce(col("_ms"), lit(0.0)).as("max_sim"),
          col("_nh").isNotNull.as("contaminated"))
    }
  }

  /** Corpus-sized wrapper for [[semanticDecon]] — `rowsPerBand` follows
    * the [[autoBits]] occupancy law (BENCH_NOTES_r9 §3 / r18 §3: fixed
    * 4-bit bands go ~n²/16 in candidates per band; ceil(log2(n /
    * target)) restores ~n·const). The `bands` recall knob stays manual
    * and should RISE with rowsPerBand when the threshold sits low (the
    * SCALE.md round-19 recall table) — band b of any width is the same
    * deterministic planes prefix-free family, so recall remains
    * monotone in bands at fixed width.
    */
  def semanticDeconAuto(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      isBench: Column,
      threshold: Double,
      bands: Int = 4,
      dim: Int = 64,
      targetBucketRows: Int = 128,
      maxBucketSize: Int = 4096): DataFrame = {
    val n = math.max(df.count(), 1L)
    val r = autoBits(n, targetBucketRows)
    semanticDecon(df, idCol, vecCol, isBench, threshold, bands, r, dim,
      maxBucketSize)
  }

  /** Exact-recall yardstick for [[semanticDecon]] — the same
    * corpus-contamination report computed with NO LSH: every (corpus,
    * benchmark) pair scored. [[semanticDecon]]'s sign-bit bands are
    * probabilistic (no pigeonhole guarantee, unlike simhash/phash band
    * blocking), so its recall must be MEASURED, not assumed — this twin
    * is the instrument (the `cosineDupPairsExact` convention: run both
    * on a sample, diff the contaminated sets, tune `bands` until the
    * measured recall holds).
    *
    * 100 TB shape: the benchmark side is eval-set-sized by definition,
    * so it broadcasts (guarded, the bruteTopK rule) and the "cross"
    * join is one map-side pass over the corpus — linear, never
    * corpus-quadratic. Still ~|bench|× the per-row work of the banded
    * path: a yardstick you run on samples, not the production rung.
    * Output contract identical to [[semanticDecon]]:
    * `(id, n_hits, max_sim, contaminated)`.
    */
  def semanticDeconExact(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      isBench: Column,
      threshold: Double,
      maxBenchRows: Long = MaxBroadcastQueries): DataFrame = {
    val base = df.select(col(idCol).as("_id"), col(vecCol).as("_v"),
        isBench.as("_bench"))
      .withColumn("_n", norm(col("_v")))
    val bench = base.filter(col("_bench"))
      .select(col("_id").as("b"), col("_v").as("_vb"), col("_n").as("_nb"))
    val nb = bench.count()
    require(nb <= maxBenchRows,
      s"semanticDeconExact benchmark side has $nb rows (max $maxBenchRows):" +
        " too large to broadcast — use semanticDecon (LSH-banded), or " +
        "raise maxBenchRows explicitly")
    // materialized corpus norms (the bruteTopK rule) — also reused by
    // the final left join, so the checkpoint pays for itself twice
    val corpus = matStream(base.filter(!col("_bench"))
      .select(col("_id"), col("_v").as("_va"), col("_n").as("_na")))
    val hits = corpus.crossJoin(broadcast(bench))
      .withColumn("sim",
        round(dot(col("_va"), col("_vb")) / (col("_na") * col("_nb")), 6))
      .filter(col("sim") >= threshold)
      .groupBy(col("_id"))
      .agg(count(lit(1)).as("_nh"), max(col("sim")).as("_ms"))
    corpus.select(col("_id").as(idCol))
      .join(hits, col(idCol) === col("_id"), "left")
      .select(col(idCol),
        coalesce(col("_nh"), lit(0L)).as("n_hits"),
        coalesce(col("_ms"), lit(0.0)).as("max_sim"),
        col("_nh").isNotNull.as("contaminated"))
  }

  /** Exact-cosine verification of candidate (a, b) pairs against the
    * materialized (vector, norm) base; keeps pairs >= threshold.
    */
  private def verifyCosine(cand: DataFrame, base: DataFrame,
      threshold: Double): DataFrame = {
    val va = base.select(col("_id").as("a"), col("_v").as("_va"),
      col("_n").as("_na"))
    val vb = base.select(col("_id").as("b"), col("_v").as("_vb"),
      col("_n").as("_nb"))
    cand.join(va, "a").join(vb, "b")
      .withColumn("sim",
        round(dot(col("_va"), col("_vb")) / (col("_na") * col("_nb")), 6))
      .filter(col("sim") >= threshold)
      .select(col("a"), col("b"), col("sim"))
  }

  // ---- IVF (inverted-file) ANN -------------------------------------------

  /** Squared L2 distance to a centroid literal (sequential fold, double
    * accumulator — same determinism contract as [[dot]]; codegen'd
    * [[graft.functions.FloatSqDist]]).
    */
  private def sqDist(vec: Column, cent: Array[Float]): Column =
    graft.functions.VectorExpressions.floatSqDist(
      vec, array(cent.toIndexedSeq.map(lit(_)): _*))

  /** Distances to every cell centroid, as ONE materialized array column
    * (HOFs are interpreted and not CSE'd — consumers must read
    * `element_at` off this array, never re-derive the fold).
    */
  private def cellDists(vec: Column, cents: Seq[Array[Float]]): Column =
    array(cents.map(sqDist(vec, _)): _*)

  /** The `nProbe` nearest cell ids, nearest first. Ties break to the lower
    * cell id (struct sort is lexicographic on (dist, cell)), so the probe
    * list for nProbe = p is always a PREFIX of the list for p + 1 —
    * candidate sets nest, making recall monotone in nProbe.
    */
  private def probeCells(dists: Column, nCells: Int, nProbe: Int): Column = {
    val byDist = sort_array(array((0 until nCells).map(i =>
      struct(element_at(dists, i + 1).as("d"), lit(i).as("c"))): _*))
    transform(slice(byDist, 1, math.min(nProbe, nCells)), s => s.getField("c"))
  }

  /** K-means coarse quantizer, trained driver-side over a bounded sample:
    * the `maxTrainRows` first rows in md5(id) order (a deterministic
    * pseudo-random shuffle; TakeOrdered — no full sort at scale), seeded
    * from the sample head, refined with `iters` Lloyd steps in plain Scala.
    *
    * Driver-side training is the standard coarse-quantizer shape (the
    * quantizer needs a representative sample, not the corpus — at 100 TB
    * you train on ~100k rows and ASSIGN distributedly): 100k × 64 floats
    * ≈ 25 MB, one Spark job, and — unlike a distributed Lloyd step whose
    * partial-sum order floats with partitioning — the fold order here is
    * total, so centroids (hence cells, hence results) are bit-reproducible.
    */
  def ivfCentroids(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nCells: Int,
      iters: Int = 2,
      maxTrainRows: Int = 100000): Array[Array[Float]] = {
    val sample = trainSample(corpus, idCol, vecCol, maxTrainRows)
    require(sample.length >= nCells,
      s"ivfCentroids: ${sample.length} training rows < $nCells cells")
    lloyd(sample, nCells, iters)
  }

  /** The bounded deterministic training sample shared by every
    * driver-side quantizer trainer: the `maxTrainRows` first rows in
    * md5(id) order (a pseudo-random shuffle; TakeOrdered — no full sort
    * at scale).
    */
  private def trainSample(corpus: DataFrame, idCol: String,
      vecCol: String, maxTrainRows: Int): Array[Array[Float]] =
    corpus
      .select(md5(col(idCol).cast("string")).as("_h"), col(vecCol).as("_v"))
      .orderBy("_h")
      .limit(maxTrainRows)
      .collect()
      .map(_.getSeq[Float](1).toArray)

  /** Plain-Scala Lloyd refinement, seeded from the sample head. Total
    * fold order ⇒ bit-reproducible centroids (unlike a distributed
    * Lloyd step whose partial-sum order floats with partitioning).
    */
  private def lloyd(sample: Array[Array[Float]], k: Int,
      iters: Int): Array[Array[Float]] = {
    val dim = sample.head.length
    var cents = sample.take(k).map(_.clone())
    for (_ <- 0 until iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      sample.foreach { v =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var d = 0.0; var i = 0
          while (i < dim) { val t = (v(i) - cents(c)(i)).toDouble; d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        val s = sums(best); var i = 0
        while (i < dim) { s(i) += v(i); i += 1 }
        counts(best) += 1
      }
      cents = Array.tabulate(k) { c =>
        if (counts(c) == 0) cents(c) // empty cell keeps its centroid
        else Array.tabulate(dim)(i => (sums(c)(i) / counts(c)).toFloat)
      }
    }
    cents
  }

  /** Product-quantization codebooks (Jégou et al. 2011): the vector is
    * split into `m` contiguous subspaces of dim/m dims; each subspace
    * gets its own `ksub`-centroid Lloyd codebook over the SAME bounded
    * deterministic sample as [[ivfCentroids]]. Returns
    * books(subspace)(centroid)(dim) — driver-side literals, never
    * broadcast state.
    */
  def pqCodebooks(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int,
      ksub: Int,
      iters: Int = 2,
      maxTrainRows: Int = 100000): Array[Array[Array[Float]]] = {
    val sample = trainSample(corpus, idCol, vecCol, maxTrainRows)
    require(sample.length >= ksub,
      s"pqCodebooks: ${sample.length} training rows < $ksub centroids")
    val dim = sample.head.length
    require(dim % m == 0, s"pqCodebooks: dim $dim not divisible by m=$m")
    val dsub = dim / m
    Array.tabulate(m) { j =>
      lloyd(sample.map(v => v.slice(j * dsub, (j + 1) * dsub)), ksub, iters)
    }
  }

  /** Deterministic md5-seeded PQ codebooks (the [[planes]] scheme,
    * scaled into [-0.5, 0.5) — the corpus embedding range): centroid
    * component (subspace j, centroid c, dim i) from md5("pqbook_j_c_i").
    * Static — independent of the data — so the DuckDB oracle can embed
    * the exact book and replay encode + ADC bit-for-bit. Production
    * code wants [[pqCodebooks]] (trained beats seeded on distortion);
    * the seeded form pins the machinery and serves as a cold-start
    * book.
    */
  def pqSeedBooks(m: Int, ksub: Int,
      dsub: Int): Array[Array[Array[Float]]] = {
    val mdig = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(m) { j =>
      Array.tabulate(ksub) { c =>
        Array.tabulate(dsub) { i =>
          val h = mdig.digest(s"pqbook_${j}_${c}_$i".getBytes("UTF-8"))
            .take(8).foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
          ((java.lang.Long.remainderUnsigned(h, 2001L) - 1000L) / 2000.0)
            .toFloat
        }
      }
    }
  }

  /** PQ encode: per subspace, the index of the nearest codebook
    * centroid — the vector compresses to `m` small ints (+ nothing
    * else), a 4·dim/m-fold memory cut (64 float dims → 8 bytes at
    * m=8). Per-row codegen'd [[graft.functions.FloatSqDist]] folds over
    * materialized per-subspace distance arrays; argmin is
    * array_position(min) with ties to the LOWER centroid id — fully
    * deterministic, zero shuffle.
    */
  def pqEncode(df: DataFrame, vecCol: String,
      books: Array[Array[Array[Float]]], as: String = "pq_code")
      : DataFrame = {
    val m = books.length
    val dsub = books(0)(0).length
    val withD = books.zipWithIndex.foldLeft(df) { case (d, (cents, j)) =>
      d.withColumn(s"_pqd$j", array(cents.toIndexedSeq.map(cent =>
        graft.functions.VectorExpressions.floatSqDist(
          slice(col(vecCol), j * dsub + 1, dsub),
          array(cent.toIndexedSeq.map(lit(_)): _*))): _*))
    }
    val coded = withD.withColumn(as, array((0 until m).map(j =>
      (array_position(col(s"_pqd$j"), array_min(col(s"_pqd$j"))) - 1)
        .cast("int")): _*))
    (0 until m).foldLeft(coded)((d, j) => d.drop(s"_pqd$j"))
  }

  /** PQ top-k via asymmetric distance computation (ADC): the corpus is
    * scanned as CODES ONLY (m small ints per row — the compressed
    * index); each query precomputes its m×ksub table of exact
    * subspace distances to every centroid, and a corpus row's
    * approximate squared distance is m table lookups summed. The
    * memory-scale ANN form: at 100 TB the code table is dim·4/m× smaller
    * than the float corpus, the per-pair cost is m adds (no dot
    * product), and the scan parallelizes like any column scan. Queries
    * broadcast (guarded like [[bruteTopK]]); ranking ascends ADC
    * distance with ties to the lower id.
    */
  def pqTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      m: Int = 8,
      ksub: Int = 16,
      iters: Int = 2,
      maxTrainRows: Int = 100000,
      maxQueryRows: Long = MaxBroadcastQueries): DataFrame =
    pqTopKWithBooks(corpus, queries, idCol, vecCol, k,
      pqCodebooks(corpus, idCol, vecCol, m, ksub, iters, maxTrainRows),
      maxQueryRows)

  /** [[pqTopK]] with an explicit codebook (trained elsewhere, seeded
    * via [[pqSeedBooks]], or loaded — the index artifact is the book +
    * the encoded corpus).
    */
  def pqTopKWithBooks(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      books: Array[Array[Array[Float]]],
      maxQueryRows: Long = MaxBroadcastQueries): DataFrame = {
    val m = books.length
    val qCount = queries.count()
    require(qCount <= maxQueryRows,
      s"pqTopK query side has $qCount rows (max $maxQueryRows): too " +
        "large to broadcast — shard the query set, or raise maxQueryRows")
    // MATERIALIZE the encoded index before the join (localCheckpoint):
    // under a broadcast join, codegen defers stream-side expressions
    // into the per-match loop, so the un-materialized encode (m·ksub
    // sqdist folds per row) re-ran once per (query, corpus) PAIR —
    // measured 82 s for 400×20k pairs at sf1 vs 2.3 s materialized.
    // This is also the real serving shape: the codes table IS the
    // persisted index artifact, written once, scanned per query batch.
    val c = matStream(
      pqEncode(corpus.select(col(idCol), col(vecCol)), vecCol,
        books, "_code").drop(vecCol)) // codes only past this point
    val q = pqQueryTables(
      queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec")),
      "q_vec", books).drop("q_vec")
    val scored = c.crossJoin(broadcast(q))
      .filter(col(idCol) =!= col("q_id"))
      .withColumn("adc", adcSum(m))
    val w = Window.partitionBy(col("q_id")).orderBy(col("adc").asc, col(idCol))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col(idCol),
        round(col("adc"), 6).as("adc"))
  }

  /** Per-query ADC distance tables: `_qt{j}` holds the exact subspace-j
    * squared distances from the query to every book-j centroid (ksub
    * floats) — the m×ksub table that rides each broadcast query row.
    */
  private def pqQueryTables(df: DataFrame, vecCol: String,
      books: Array[Array[Array[Float]]]): DataFrame = {
    val dsub = books(0)(0).length
    books.zipWithIndex.foldLeft(df) { case (d, (cents, j)) =>
      d.withColumn(s"_qt$j", array(cents.toIndexedSeq.map(cent =>
        graft.functions.VectorExpressions.floatSqDist(
          slice(col(vecCol), j * dsub + 1, dsub),
          array(cent.toIndexedSeq.map(lit(_)): _*))): _*))
    }
  }

  /** Σ_j qt_j[code_j]: the ADC approximate squared distance — m table
    * lookups and adds per (query, corpus-code) pair.
    */
  private def adcSum(m: Int): Column =
    (0 until m).map(j =>
      element_at(col(s"_qt$j"), element_at(col("_code"), j + 1) + 1))
      .reduce(_ + _)

  /** IVF-PQ ANN top-k — the composed 10⁹+-row index: the IVF coarse
    * quantizer bounds the SCAN (a query touches nProbe of nCells
    * inverted lists), PQ codes bound the MEMORY (m small ints per
    * corpus row), and ADC bounds the PER-PAIR cost (m lookups, no dot
    * product). Non-residual form: codes quantize the raw vector with
    * one global book, so at `nProbe == nCells` every (query, corpus)
    * pair is scored exactly once with exactly [[pqTopKWithBooks]]'s ADC
    * distance — the full-probe result is IDENTICAL to flat PQ, which is
    * what the `emb_ivfpq_topk` oracle pins (the same equivalence trick
    * as `emb_ivf_topk` vs brute force). nProbe < nCells is the linear
    * recall/cost knob; candidate cells nest as nProbe grows, so recall
    * is monotone.
    *
    * The cell equi-join shuffle-partitions on `_cell` — at cluster
    * scale the encoded corpus can be written bucketed by cell and the
    * probe join co-locates with zero corpus movement.
    */
  def ivfpqTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nCells: Int = 16,
      nProbe: Int = 4,
      m: Int = 8,
      ksub: Int = 16,
      iters: Int = 2,
      maxTrainRows: Int = 100000,
      maxQueryRows: Long = MaxBroadcastQueries): DataFrame =
    ivfpqTopKWithIndex(corpus, queries, idCol, vecCol, k, nProbe,
      ivfCentroids(corpus, idCol, vecCol, nCells, iters, maxTrainRows),
      pqCodebooks(corpus, idCol, vecCol, m, ksub, iters, maxTrainRows),
      maxQueryRows)

  /** [[ivfpqTopK]] with explicit centroids + codebook — the index
    * artifact is (centroids, book, encoded corpus); training and
    * serving decouple.
    */
  def ivfpqTopKWithIndex(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nProbe: Int,
      cents: Array[Array[Float]],
      books: Array[Array[Array[Float]]],
      maxQueryRows: Long = MaxBroadcastQueries): DataFrame = {
    val m = books.length
    val nCells = cents.length
    val qCount = queries.count()
    require(qCount <= maxQueryRows,
      s"ivfpqTopK query side has $qCount rows (max $maxQueryRows): too " +
        "large to broadcast — shard the query set, or raise maxQueryRows")
    val centSeq = cents.toIndexedSeq
    // materialized index rows (the pqTopKWithBooks rule: un-checkpointed,
    // the encode + cell assignment re-ran per joined pair under codegen)
    val c = pqEncode(corpus.select(col(idCol), col(vecCol)), vecCol,
      books, "_code")
      .withColumn("_dists", cellDists(col(vecCol), centSeq))
      .withColumn("_cell",
        (array_position(col("_dists"), array_min(col("_dists"))) - 1)
          .cast("int"))
      .drop("_dists", vecCol) // (id, cell, codes) — the whole index row
      .transform(matStream)
    val q = pqQueryTables(
      queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec")),
      "q_vec", books)
      .withColumn("_dists", cellDists(col("q_vec"), centSeq))
      .withColumn("_cell",
        explode(probeCells(col("_dists"), nCells, nProbe)))
      .drop("_dists", "q_vec")
    // each corpus row lives in exactly one cell ⇒ a (query, corpus)
    // pair joins at most once even across multiple probed cells
    val scored = c.join(broadcast(q), "_cell")
      .filter(col(idCol) =!= col("q_id"))
      .withColumn("adc", adcSum(m))
    val w = Window.partitionBy(col("q_id")).orderBy(col("adc").asc, col(idCol))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col(idCol),
        round(col("adc"), 6).as("adc"))
  }

  /** IVF-Flat ANN top-k: the quantizer partitions the corpus into `nCells`
    * inverted lists (each corpus row lands in EXACTLY one cell — cells are
    * a partition, not overlapping buckets); a query probes its `nProbe`
    * nearest cells and ranks exact cosine inside them. The cell equi-join
    * is shuffle-partitionable; cost grows linearly in nProbe, never
    * quadratically.
    *
    * `nProbe == nCells` probes every cell, so each (query, corpus) pair is
    * scored exactly once and the result is IDENTICAL to [[bruteTopK]] —
    * the `emb_ivf_topk` oracle pins that equivalence. nProbe < nCells is
    * the linear-cost recall knob (candidate sets nest as nProbe grows, so
    * recall is monotone — see [[probeCells]]).
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nCells: Int = 16,
      nProbe: Int = 4,
      iters: Int = 2,
      maxTrainRows: Int = 100000): DataFrame = {
    val cents = ivfCentroids(corpus, idCol, vecCol, nCells, iters, maxTrainRows)
    val centSeq = cents.toIndexedSeq
    // materialized inverted-list rows (the pqTopKWithBooks rule: under
    // a broadcast-probed join, un-checkpointed cell assignment + norm
    // re-ran per joined pair)
    val c = corpus.select(col(idCol), col(vecCol))
      .withColumn("_dists", cellDists(col(vecCol), centSeq))
      .withColumn("_cell",
        (array_position(col("_dists"), array_min(col("_dists"))) - 1).cast("int"))
      .drop("_dists")
      .withColumn("_cn", norm(col(vecCol)))
      .transform(matStream)
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
      .withColumn("_dists", cellDists(col("q_vec"), centSeq))
      .withColumn("_cell", explode(probeCells(col("_dists"), nCells, nProbe)))
      .drop("_dists")
      .withColumn("_qn", norm(col("q_vec")))
    val scored = c.join(q, "_cell")
      .filter(col(idCol) =!= col("q_id"))
      .withColumn("sim", dot(col(vecCol), col("q_vec")) / (col("_cn") * col("_qn")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col(idCol))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col(idCol), round(col("sim"), 6).as("sim"))
  }

  // ---- streaming vector-index serve --------------------------------------

  /** Static IVF index rows for [[annVsIndex]] — `(_idx_id, _idx_v,
    * _cell, _idx_n)`, cell-assigned against `cents` and MATERIALIZED
    * (the SCALE.md materialize-before-broadcast-join rule; also the
    * stream-static contract: the index is the fixed corpus artifact a
    * live feed probes, the [[graft.operators.text.Dedup.nearDupIndex]]
    * convention carried to embeddings).
    */
  def vectorIndex(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      cents: Array[Array[Float]]): DataFrame =
    matStream(vectorIndexFrame(corpus, idCol, vecCol, cents))

  /** The un-materialized [[vectorIndex]] row stream — split out so a
    * WRITE path (`BucketedServe.writeVectorIndex` persists to parquet,
    * its own materialization) skips the in-memory checkpoint.
    */
  private[graft] def vectorIndexFrame(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      cents: Array[Array[Float]]): DataFrame = {
    val centSeq = cents.toIndexedSeq
    corpus.select(col(idCol).as("_idx_id"), col(vecCol).as("_idx_v"))
      .withColumn("_dists", cellDists(col("_idx_v"), centSeq))
      .withColumn("_cell",
        (array_position(col("_dists"), array_min(col("_dists"))) - 1)
          .cast("int"))
      .drop("_dists")
      .withColumn("_idx_n", norm(col("_idx_v")))
  }

  /** Similarity-search SERVE against a static [[vectorIndex]] — the
    * embedding analog of
    * [[graft.operators.text.Dedup.nearDupVsIndex]]: arriving rows
    * probe their `nProbe` nearest cells, exact cosine verifies, and
    * every `(q_id, id, sim)` with sim ≥ `threshold` emits. THRESHOLD
    * form, not top-k, deliberately: it is stateless past the
    * stream-static equi-join (no rank window), so a live feed runs it
    * AS A STREAM in append mode — the StreamingSpec pin runs a real
    * `writeStream` through this plan. Top-k serving composes the same
    * index via [[ivfTopK]] per query batch (foreachBatch).
    *
    * At `nProbe == nCells` the cells partition the index, every
    * cross-set pair is scored exactly once, and the result is EXACTLY
    * the all-pairs threshold answer — the oracle pins that; partial
    * probe is the linear-cost recall knob (candidates nest, recall
    * monotone — [[probeCells]]).
    *
    * 100 TB shape: the index is cell-partitioned (bucket by `_cell` on
    * write and the probe join co-locates); an arriving micro-batch
    * pays nProbe/nCells of the index per row, never the corpus.
    */
  def annVsIndex(
      arrivals: DataFrame,
      index: DataFrame,
      idCol: String,
      vecCol: String,
      cents: Array[Array[Float]],
      threshold: Double,
      nProbe: Int): DataFrame = {
    val centSeq = cents.toIndexedSeq
    val nCells = cents.length
    // spread the arrivals scan BEFORE the heavy probe work
    // (core.Scans, guide §2.5): under a broadcast index join the whole
    // cellDists + explode + per-pair cosine pipeline runs at the
    // stream side's partitioning — a single-row-group arrivals file
    // meant ONE task computing every candidate cosine (measured 18 s
    // of a 20 s wall on emb_vs_incr_index at sf1). No-op when the
    // stream arrives pre-spread; the index side is untouched, so the
    // bucketed no-Exchange property holds as pinned.
    val q = graft.core.Scans.spread(
        arrivals.select(col(idCol).as("q_id"), col(vecCol).as("q_vec")),
        col("q_id"))
      .withColumn("_dists", cellDists(col("q_vec"), centSeq))
      .withColumn("_cell",
        explode(probeCells(col("_dists"), nCells, nProbe)))
      .drop("_dists")
      .withColumn("_qn", norm(col("q_vec")))
    q.join(index, Seq("_cell"))
      .filter(col("_idx_id") =!= col("q_id"))
      .withColumn("sim", round(
        dot(col("q_vec"), col("_idx_v")) / (col("_qn") * col("_idx_n")), 6))
      .filter(col("sim") >= threshold)
      .select(col("q_id"), col("_idx_id").as("id"), col("sim"))
  }
}
