package graft.operators.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for the large-scale training-data pipeline:
  * composition reports, per-domain caps, and deterministic global
  * shuffling for training order.
  *
  * The Common-Crawl-style curation loop is: measure the mix
  * ([[domainStats]]), bound any one domain's dominance ([[capPerKey]] —
  * the "at most N pages per host" rule), then fix a reproducible
  * training order ([[shuffleOrder]]). All three are built on the same
  * md5-derived determinism as [[TextOps.hashSample]] so every engine —
  * and every re-run — selects and orders the exact same rows.
  */
object Curation {

  /** Corpus composition report: per-domain document count, total weight
    * (typically a token count), and the domain's share of the corpus
    * weight — the "what is my mix" input to [[TextOps.sampleToMixture]].
    *
    * 100 TB shape: one map-side-combined aggregate down to
    * domain-cardinality rows, then the 1-row grand total joins back by
    * broadcast — no second scan of the corpus, no driver collect.
    */
  def domainStats(df: DataFrame, domain: Column, weight: Column)
      : DataFrame = {
    val per = df.groupBy(domain.as("domain"))
      .agg(count(lit(1)).as("n_docs"),
        sum(weight.cast("long")).as("n_weight"))
    val tot = per.agg(sum(col("n_weight")).as("_tot"))
    per.join(broadcast(tot))
      .withColumn("share", round(col("n_weight") / col("_tot"), 6))
      .drop("_tot")
  }

  /** Keep at most `n` rows per key, selected deterministically: rows
    * rank by (md5-hash of id, id) inside each key, so the survivors are
    * a stable pseudo-random subset — the per-host / per-domain cap rule
    * of web-corpus curation (no domain floods the corpus), with none of
    * the order-dependence a `limit` inside a group would have.
    *
    * 100 TB shape: one shuffle on the key, then a PARTITIONED window
    * (never a global sort). Skewed domains are bounded by the rank
    * filter itself — a hot key's rows all land in one task, which is the
    * floor any exact per-key top-n pays; for pathological single-key
    * skew, pre-filter with [[TextOps.hashSample]] at a rate that
    * over-samples `n` and cap the remainder here.
    */
  def capPerKey(df: DataFrame, key: Seq[Column], id: Column, n: Int)
      : DataFrame = {
    require(n > 0, s"capPerKey: n must be positive, got $n")
    val w = Window.partitionBy(key: _*)
      .orderBy(TextOps.hash60(id.cast("string")), id)
    df.withColumn("_cap_rn", row_number().over(w))
      .filter(col("_cap_rn") <= n)
      .drop("_cap_rn")
  }

  /** Deterministic global shuffle for training order: every row gets a
    * 0-based position `as`, ordered by md5(seed || "|" || id). The same
    * (corpus, seed) yields the same permutation on every run and every
    * engine — reproducible epoch ordering without RNG state — and a new
    * seed is a fresh permutation.
    *
    * 100 TB shape: the ordering is a range partition on the hash (every
    * partition stays parallel) and the numbering is the partition-offset
    * scheme of [[graft.operators.stateless.GlobalOrder]] — there is no
    * single-task global sort anywhere. Inherently batch: a global
    * permutation needs the whole epoch's rows by definition.
    */
  def shuffleOrder(df: DataFrame, id: Column, seed: String,
      as: String = "pos"): DataFrame = {
    val key = md5(concat_ws("|", lit(seed), id.cast("string")))
    graft.operators.stateless.GlobalOrder
      .rowNumber(df.withColumn("_shuf", key), Seq(col("_shuf"), id), as)
      .withColumn(as, col(as) - 1)
      .drop("_shuf")
  }

  /** Greedy token-budget selection: rows are taken in `order` until the
    * running `tokens` total would exceed `budget` — "fill one epoch's
    * worth of tokens" (ordered by a [[shuffleOrder]]-style hash for a
    * reproducible random epoch, or by a quality score descending for
    * best-first selection). The inclusive running total lands as `as`,
    * so downstream sees exactly where in the budget each survivor sits;
    * the row that would cross the budget is dropped (strict fill — no
    * overshoot).
    *
    * 100 TB shape: [[graft.operators.stateless.GlobalOrder.runningSum]]
    * — a range partition on the order key plus the partition-offset
    * prefix-sum, never an unpartitioned window; the final gate is a
    * per-row filter. Inherently batch: a global prefix sum needs the
    * whole corpus ordered by definition.
    */
  def tokenBudget(df: DataFrame, order: Seq[Column], tokens: Column,
      budget: Long, as: String = "cum_tokens"): DataFrame = {
    require(budget > 0, s"tokenBudget: budget must be positive, got $budget")
    graft.operators.stateless.GlobalOrder
      .runningSum(df, order, tokens, as)
      .filter(col(as) <= budget)
  }

  /** Weighted sampling WITHOUT replacement, k rows per stratum —
    * Efraimidis–Spirakis A-ES with the md5-derived uniform: each row
    * draws u = (hash60(id)+0.5)/2^60 ∈ (0,1) and ranks by
    * ln(u)/weight descending (the order statistic of u^(1/w)), so a
    * row's selection probability is proportional to its weight and
    * nothing is drawn twice. Deterministic — no RNG state, the same
    * survivors on every run and engine — which is what distinguishes it
    * from `df.sample`: a mixture built from it is reproducible
    * end-to-end.
    *
    * 100 TB shape: one shuffle on the stratum key and a PARTITIONED
    * row_number window (per-stratum top-k — the [[capPerKey]] shape);
    * the key itself is a per-row expression. For a single global
    * stratum pass `Nil` and the plan becomes orderBy+limit
    * (TakeOrdered — per-partition top-k, then a k-sized driver merge).
    */
  /** One-call corpus composition report per stratum — the
    * "what am I about to train on" summary: document count, token sum,
    * mean and EXACT p50/p95 token counts (the reference percentile
    * interpolation of [[graft.operators.agg.AggFunctions.percentiles]]),
    * and each stratum's share of corpus tokens. Token counts are small
    * integers, so the double sums are exact and partition-order-free.
    *
    * 100 TB shape: one groupBy(stratum) shuffle carrying a sorted
    * per-stratum token list (stratum sizes bound the sort — the exact
    * percentile floor any engine pays; `.approx` sketches are the
    * documented switch when strata are corpus-sized), then the 1-row
    * grand total joins back by broadcast (the [[domainStats]] pattern).
    */
  def corpusReport(df: DataFrame, stratum: Column, text: Column,
      approx: Boolean = false): DataFrame = {
    val t = df.select(stratum.as("stratum"),
      TextOps.tokenCount(text).cast("double").as("_tok"))
    // approx = the corpus-sized-strata switch: percentile_approx's
    // bounded sketch replaces the per-stratum sorted list (the exact
    // form's memory floor) — the `.approx(true)` convention of the
    // aggregate nodes; exact stays the oracle-pinned default
    val pcts =
      if (approx) percentile_approx(col("_tok"),
        array(lit(0.5), lit(0.95)), lit(10000))
      else graft.operators.agg.AggFunctions.percentiles(col("_tok"),
        Seq(0.5, 0.95))
    val per = t.groupBy(col("stratum")).agg(
      count(lit(1)).as("n_docs"),
      sum(col("_tok")).cast("long").as("n_tokens"),
      round(avg(col("_tok")), 6).as("mean_tok"),
      pcts.as("_ps"))
    val tot = per.agg(sum(col("n_tokens")).as("_tot"))
    per.join(broadcast(tot))
      .select(col("stratum"), col("n_docs"), col("n_tokens"),
        col("mean_tok"),
        round(element_at(col("_ps"), 1), 6).as("p50_tok"),
        round(element_at(col("_ps"), 2), 6).as("p95_tok"),
        round(col("n_tokens") / col("_tot"), 6).as("token_share"))
  }

  /** Corpus snapshot diff — the delta-curation primitive between two
    * crawls/exports of the same corpus: every doc id labeled
    * `added` (only in the new snapshot), `removed` (only in the old),
    * `changed` (both, different content hash) or `same`. Downstream,
    * an incremental pipeline re-processes added+changed only and
    * retires removed — the difference between re-running 100 TB and
    * re-running the day's delta.
    *
    * 100 TB shape: one md5 per row (a scan on each side) and a single
    * id-keyed full outer sort-merge join — both sides partition on the
    * id; snapshots bucketed by id make it co-located. Content equality
    * is by full md5 digest, the [[Dedup.exactDupGroups]] convention.
    */
  def snapshotDiff(old: DataFrame, cur: DataFrame, id: Column,
      text: Column): DataFrame = {
    val o = old.select(id.as("doc_id"), md5(text).as("_oh"))
    val c = cur.select(id.as("doc_id"), md5(text).as("_ch"))
    o.join(c, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("_oh").isNull, "added")
          .when(col("_ch").isNull, "removed")
          .when(col("_oh") === col("_ch"), "same")
          .otherwise("changed").as("status"))
  }

  /** All dot-suffixes of a domain, most-specific first:
    * `sub.spam.example` → `[sub.spam.example, spam.example, example]` —
    * the expansion that gives a blocklist SUFFIX semantics (an entry
    * blocks every subdomain under it, the standard URL-curation rule).
    */
  def domainSuffixes(domain: Column): Column = {
    val parts = split(domain, "\\.")
    transform(sequence(lit(1), size(parts)),
      i => array_join(slice(parts, i, size(parts)), "."))
  }

  /** Domain blocklist with suffix semantics, literal-list form: a row
    * is blocked iff ANY dot-suffix of its domain is listed. The list
    * embeds in the plan (right for the usual 10²–10⁴-entry curated
    * lists) — pure per-row scan, zero shuffle, streams as-is.
    * `annotate = true` keeps everything and lands `blocked`.
    */
  def domainBlocklist(df: DataFrame, domain: Column,
      blocked: Seq[String], annotate: Boolean = false): DataFrame = {
    require(blocked.nonEmpty, "domainBlocklist: empty blocklist")
    val isBlocked = arrays_overlap(domainSuffixes(domain),
      array(blocked.map(lit(_)): _*))
    if (annotate) df.withColumn("blocked", isBlocked)
    else df.filter(!isBlocked)
  }

  /** [[domainBlocklist]]'s table form for blocklists too large to
    * embed (threat feeds run millions of entries): explode the ≤
    * label-count suffixes, anti-join the blocklist on the suffix — a
    * partitionable equi-join, no broadcast requirement, no row limit
    * on either side.
    */
  def domainBlocklistTable(df: DataFrame, domain: Column, id: Column,
      blocklist: DataFrame): DataFrame = {
    val hits = df
      .select(id.as("_bid"), explode(domainSuffixes(domain)).as("_suf"))
      .join(blocklist.select(col("domain").as("_suf")), Seq("_suf"),
        "left_semi")
      .select(col("_bid")).distinct()
    df.join(hits, id === col("_bid"), "left_anti")
  }

  /** Token-distribution drift between two corpus snapshots: per-token
    * contribution to the add-one-smoothed KL(after ‖ before) — the
    * "did the crawl/filter change what the model will read"
    * observability report. Over the UNION vocabulary V:
    * `p = (cnt_after + 1) / (N_after + |V|)`, `q` likewise on before,
    * and the row's term is `p · ln(p / q)`, nano-scaled to a LONG (the
    * perplexity convention) so Σ kl_nano is order-free and the total
    * divergence is an exact integer sum downstream. Positive terms =
    * tokens the new snapshot over-represents; sorted by |term| they
    * ARE the drift explanation.
    *
    * 100 TB shape: one token aggregate per side (map-side combined),
    * one token-keyed outer join (both sides already hash-partitioned
    * by token from their aggregates — no extra shuffle), one 1-row
    * broadcast of the totals. Vocabulary-sized, never corpus-sized;
    * for n-gram drift, gate the gram stream with
    * [[graft.operators.text.Sketches.heavyHitters]] first.
    */
  def tokenKlDrift(before: DataFrame, after: DataFrame, text: Column)
      : DataFrame = {
    def cnts(df: DataFrame, as: String) =
      df.select(explode(TextOps.tokens(text)).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as(as))
    val joined = cnts(before, "cnt_before")
      .join(cnts(after, "cnt_after"), Seq("token"), "full_outer")
      .select(col("token"),
        coalesce(col("cnt_before"), lit(0L)).as("cnt_before"),
        coalesce(col("cnt_after"), lit(0L)).as("cnt_after"))
    val tot = joined.agg(sum(col("cnt_before")).as("_nb"),
      sum(col("cnt_after")).as("_na"), count(lit(1)).as("_v"))
    // each KL term in pure fixed-point (the nb_classify hardening):
    // ln(pa/pb) = lnNano(ca+1) − lnNano(na+v) − lnNano(cb+1) +
    // lnNano(nb+v), then pa·Δ as an exact decimal product with a
    // truncating integral divide (Spark `div` == DuckDB `//`, both
    // toward zero) — no libm, no double rounding anywhere
    val F = graft.functions.FixedLog
    val base = joined.join(broadcast(tot))
      .withColumn("_ca1", col("cnt_after") + lit(1L))
      .withColumn("_cb1", col("cnt_before") + lit(1L))
      .withColumn("_dna", col("_na") + col("_v"))
      .withColumn("_dnb", col("_nb") + col("_v"))
    Seq(("_ca1", "_ln_ca"), ("_dna", "_ln_na"), ("_cb1", "_ln_cb"),
      ("_dnb", "_ln_nb"))
      .foldLeft(base) { case (cur, (in, out)) =>
        F.withLnNano(cur, col(in), out)
      }
      .withColumn("_dlt", col("_ln_ca") - col("_ln_na") -
        col("_ln_cb") + col("_ln_nb"))
      .select(col("token"), col("cnt_before"), col("cnt_after"),
        expr("CAST((CAST(_ca1 AS DECIMAL(38,0)) * CAST(_dlt AS " +
          "DECIMAL(38,0))) div CAST(_dna AS DECIMAL(38,0)) AS BIGINT)")
          .as("kl_nano"))
  }

  /** Deterministic train/validation/test split: each row lands in
    * exactly one named bucket with the given fractions, keyed on the
    * md5 row gate — the same document goes to the same split on every
    * run, every engine, and every corpus size (membership depends only
    * on the id, so growing the corpus never moves an existing doc
    * across splits — the leakage-safety property a random split lacks).
    * Fractions must sum to 1 (±1e-9); bucket edges are cumulative
    * fractions over the md5-uniform in [0, 1e6).
    *
    * 100 TB shape: a pure per-row expression — no shuffle, streams
    * as-is.
    */
  def splitAssign(df: DataFrame, id: Column,
      splits: Seq[(String, Double)], as: String = "split"): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      "splitAssign: fractions must be positive")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"splitAssign: fractions must sum to 1, got ${splits.map(_._2).sum}")
    val h = pmod(TextOps.hash60(id.cast("string")), lit(1000000L))
    val edges = splits.scanLeft(0.0)(_ + _._2).tail
    // double-vs-double compare, the applyMixtureGate boundary rule; the
    // last bucket is the otherwise-arm so fraction rounding can never
    // leave a row unassigned
    val expr = splits.init.zip(edges).foldRight(
      lit(splits.last._1): Column) { case (((name, _), edge), rest) =>
      when(h < edge * 1000000.0, name).otherwise(rest)
    }
    df.withColumn(as, expr)
  }

  /** Train/test split-leakage report — eval hygiene for the
    * [[splitAssign]] splits: a near-duplicate pair straddling train
    * and test silently inflates every benchmark number (the model
    * "generalizes" to a paraphrase of its own training data).
    * Composes [[Dedup.nearDupPairs]] with the split assignment and
    * reports every cross-split near-dup pair:
    * `(a, b, jac, split_a, split_b)` — empty output IS the hygiene
    * certificate; non-empty output is the exact re-split worklist
    * (move one side, or drop the pair from eval).
    *
    * 100 TB shape: the pair machinery carries its own documented
    * shape; the split columns are pure per-row hash expressions joined
    * back doc-keyed; the cross-split filter is a scan over PAIR rows.
    */
  def splitLeakPairs(df: DataFrame, text: Column, id: Column,
      splits: Seq[(String, Double)], threshold: Double,
      bands: Int = 4, rowsPerBand: Int = 2): DataFrame = {
    val pairs = graft.operators.text.Dedup.nearDupPairs(df, text, id,
      threshold, bands, rowsPerBand)
    val sp = splitAssign(df.select(id.as("doc_id")), col("doc_id"),
      splits)
    pairs
      .join(sp.select(col("doc_id").as("a"),
        col("split").as("split_a")), "a")
      .join(sp.select(col("doc_id").as("b"),
        col("split").as("split_b")), "b")
      .filter(col("split_a") =!= col("split_b"))
      .select(col("a"), col("b"), col("jac"),
        col("split_a"), col("split_b"))
  }

  /** TRAINED linear classifier over hashed token buckets — fixed-point
    * full-batch gradient descent with a HARD sigmoid, so the training
    * itself is bit-replayable (the fasttext-style classifier
    * [[naiveBayesClassify]] cannot learn feature interactions with;
    * this one learns weights). Every quantity is integral: features
    * are bucket counts, weights live in micro units, the sigmoid is
    * the piecewise-linear clamp(0, 1000, 500 + m div 4000) in milli
    * (σ̂(m) = 0.5 + 0.25·m clamped — exact, no libm exp whose last
    * ulp differs across engines), gradients are exact long sums, and
    * the step is a truncating division by the train count. Same
    * weights on every run, engine, partitioning.
    *
    * Returns every SCORE-side doc as (doc_id, m_micro, pred) where
    * m_micro is the final margin and pred = m_micro > 0.
    *
    * 100 TB shape: per iteration one bucket-keyed join (weights table
    * is `buckets`+1 rows — broadcast), one doc-keyed margin aggregate,
    * one bucket-keyed gradient aggregate, and a (buckets+1)-row
    * checkpoint — the pageRank loop contract; features build once
    * into a scope-cached (doc, bucket, cnt) table.
    */
  def linearClassify(train: DataFrame, score: DataFrame, text: Column,
      id: Column, labelIsPos: Column, buckets: Int = 64,
      iters: Int = 3, lrNum: Long = 16L,
      localTrainDocs: Long = 1L << 18): DataFrame = {
    require(buckets >= 1 && iters >= 1 && lrNum >= 1,
      "linearClassify: buckets, iters and lrNum must be >= 1")
    def features(df: DataFrame, idc: Column) = {
      val tok = df.select(idc.as("doc_id"),
        explode(TextOps.tokens(text)).as("_tok"))
      tok.select(col("doc_id"),
          pmod(TextOps.hash60(col("_tok")), lit(buckets.toLong))
            .as("_b"))
        .groupBy(col("doc_id"), col("_b"))
        .agg(count(lit(1)).as("_cnt"))
        .union(df.select(idc.as("doc_id"), lit(-1L).as("_b"),
          lit(1L).as("_cnt")))
    }
    val spark = train.sparkSession
    import spark.implicits._
    // per-doc COMPACT feature rows (doc, label, [(bucket, cnt)]) built
    // once: each GD step is then ONE map-side-combined aggregate job —
    // margin and error are per-ROW expressions over the array (no
    // doc-keyed shuffle), and only the (buckets+1)-row gradient crosses
    // the wire. The former shape joined the (doc, bucket, cnt) table
    // twice per step (margin agg + gradient agg + weight checkpoint =
    // 7 jobs/step, 153 jobs/query measured at iters = 20).
    graft.core.CacheScope.withPersisted(
      features(train, id)
        .join(train.select(id.as("doc_id"),
          when(labelIsPos, 1000L).otherwise(0L).as("_y")), Seq("doc_id"))
        .groupBy(col("doc_id"), col("_y"))
        .agg(collect_list(struct(col("_b"), col("_cnt"))).as("_f"))
    ) { docVec =>
      val n = train.count() // bounded driver scalar: the LR denominator
      require(n > 0, "linearClassify: empty train side")
      // weights live on the driver between steps: buckets+1 longs (the
      // sanctioned k-scalars class — same as k·dim centroid tables);
      // index 0 is the bias bucket (_b = -1). Arithmetic is unchanged
      // on every path: order-free long sums, the same `div` truncation
      // points, so the trained weights are bit-identical to the
      // original chained form.
      val nL = n
      val w: Array[Long] =
        if (n <= localTrainDocs) {
          // single-task GD finisher (the graph localFinishEdges
          // discipline for training loops): the whole `iters`-step
          // fixed point runs as ONE bounded task over the compact
          // feature rows (≤ localTrainDocs × ~1 KB) — per-step Spark
          // jobs are pure scheduling overhead at this size. The
          // returned value is buckets+1 longs. Above the threshold
          // the per-step aggregate loop below is the scale path.
          val itersL = iters; val bucketsL = buckets; val lrNumL = lrNum
          docVec.select(col("_y"), col("_f._b"), col("_f._cnt"))
            .repartition(1).rdd.mapPartitions { it =>
              val rows = it.map { r =>
                (r.getLong(0), r.getSeq[Long](1).toArray,
                  r.getSeq[Long](2).toArray)
              }.toArray
              var wl = Array.fill(bucketsL + 1)(0L)
              var t = 0
              while (t < itersL) {
                val g = Array.fill(bucketsL + 1)(0L)
                rows.foreach { case (y, bs, cs) =>
                  var m = 0L
                  var i = 0
                  while (i < bs.length) {
                    m += cs(i) * wl((bs(i) + 1L).toInt); i += 1
                  }
                  val e = math.max(0L, math.min(1000L, 500L + m / 4000L)) - y
                  i = 0
                  while (i < bs.length) {
                    g((bs(i) + 1L).toInt) += e * cs(i); i += 1
                  }
                }
                wl = Array.tabulate(bucketsL + 1)(i =>
                  wl(i) - g(i) * lrNumL / nL)
                t += 1
              }
              Iterator.single(wl)
            }.collect()(0)
        } else {
          var wl = Array.fill(buckets + 1)(0L)
          for (_ <- 1 to iters) {
            val wLit = array(wl.toSeq.map(lit): _*)
            val grads = docVec
              .withColumn("_m", aggregate(col("_f"), lit(0L), (acc, x) =>
                acc + x.getField("_cnt") *
                  element_at(wLit, (x.getField("_b") + lit(2L)).cast("int"))))
              // hard sigmoid in milli: clamp(0, 1000, 500 + m div 4000)
              .withColumn("_e", greatest(lit(0L), least(lit(1000L),
                lit(500L) + expr("_m div 4000"))) - col("_y"))
              .select(explode(col("_f")).as("_x"),
                col("_e"))
              .select(col("_x._b").as("_b"),
                (col("_e") * col("_x._cnt")).as("_ec"))
              .groupBy(col("_b")).agg(sum(col("_ec")).as("_g"))
              .collect()
            val g = grads.map(r => r.getLong(0) -> r.getLong(1)).toMap
            wl = Array.tabulate(buckets + 1)(i =>
              wl(i) - g.getOrElse((i - 1).toLong, 0L) * lrNum / nL)
          }
          wl
        }
      val wDf = (-1L until buckets.toLong).map(b => (b, w((b + 1).toInt)))
        .toDF("_b", "_w")
      features(score, id)
        .join(broadcast(wDf), Seq("_b"))
        .groupBy(col("doc_id"))
        .agg(sum(col("_cnt") * col("_w")).as("m_micro"))
        .withColumn("pred", col("m_micro") > 0)
    }
  }

  /** Per-GROUP z-score + outlier flag — the "is this document weird
    * for its domain/language" gate (a 50-char doc is normal in chat
    * data and an outlier in web text, so global thresholds misfire).
    * Lands `z_nano` (round((x − mean)/sd · 10⁹), the [[VectorCuration
    * .whiten]] rendering) and `is_outlier` (|z| > threshold);
    * zero-variance groups z to 0.
    *
    * Determinism: group stats from exact integral sums (micro-
    * quantized values, DECIMAL accumulation), then one fixed IEEE
    * chain — the whiten contract, per group instead of per dimension.
    *
    * 100 TB shape: one group-keyed map-side-combined aggregate + one
    * group-keyed equi-join back (group-cardinality build side —
    * broadcastable for languages/sources, partitionable for hosts).
    */
  def groupZScore(df: DataFrame, by: Column, value: Column,
      threshold: Double = 3.0): DataFrame = {
    val xm = round(value.cast("double") * 1000000L).cast("long")
    val stats = df.select(by.as("_grp"), xm.as("_xm"))
      .groupBy(col("_grp"))
      .agg(sum(col("_xm").cast("decimal(38,0)")).as("_sx"),
        sum((col("_xm") * col("_xm")).cast("decimal(38,0)")).as("_sxx"),
        count(lit(1)).as("_n"))
      .select(col("_grp"),
        (col("_sx").cast("double") / col("_n") / 1000000L).as("_mean"),
        (col("_sxx").cast("double") / col("_n") / 1e12 -
          (col("_sx").cast("double") / col("_n") / 1000000L) *
          (col("_sx").cast("double") / col("_n") / 1000000L)).as("_var"))
    val xq = xm.cast("double") / 1000000L
    df.withColumn("_grp", by)
      .join(stats, Seq("_grp"))
      .withColumn("z_nano",
        when(col("_var") <= 0, lit(0L))
          .otherwise(round((xq - col("_mean")) / sqrt(col("_var")) *
            lit(1e9)).cast("long")))
      .withColumn("is_outlier",
        abs(col("z_nano")) > (threshold * 1e9).toLong)
      .drop("_grp", "_mean", "_var")
  }

  /** Exact corpus-wide quantile buckets (curriculum / stratification
    * assignment): bucket = floor((rank−1)·k / n) over the global rank
    * by (score, tieBreak) — ntile semantics with a TOTAL order, so
    * every engine and every re-run lands each row in the same bucket.
    *
    * 100 TB shape: the rank comes from [[graft.operators.stateless
    * .GlobalOrder.rowNumber]] (range-partition + partition-offset
    * zipWithIndex — the scale-safe global-order primitive, never
    * `Window.orderBy` without a partition), the count is a 1-row
    * broadcast, the assignment a per-row integer expression.
    */
  def quantileBuckets(df: DataFrame, score: Column, tieBreak: Column,
      k: Int, as: String = "bucket"): DataFrame = {
    require(k >= 1, s"quantileBuckets: k must be >= 1, got $k")
    val ranked = graft.operators.stateless.GlobalOrder
      .rowNumber(df, Seq(score, tieBreak), "_qrank")
    val n = ranked.agg(count(lit(1)).as("_qn"))
    ranked.join(broadcast(n))
      .withColumn(as,
        expr(s"((_qrank - 1) * $k) div _qn").cast("int"))
      .drop("_qrank", "_qn")
  }

  /** Canonical form of an absolute http(s) URL — the crawl-frontier
    * normalization that makes URL-level dedup and [[domainBlocklist]]
    * joins meaningful: two spellings of the same page must collapse to
    * one key BEFORE any grouping.
    *
    * Rules (each deterministic, order fixed): strip the fragment;
    * lowercase scheme and host (missing scheme → `http`); strip one
    * leading `www.`; drop the default port (`:80` for http, `:443` for
    * https); collapse the path's trailing slashes (empty path → `/`);
    * drop tracking params (`utm_*`, `gclid`, `fbclid`, `ref`), sort the
    * survivors byte-wise, drop an empty query entirely.
    *
    * 100 TB shape: a pure per-row expression — no shuffle, no UDF,
    * streams as-is.
    */
  def urlCanon(url: Column): Column = {
    val pat = "^(?:([a-zA-Z][a-zA-Z0-9+.-]*)://)?([^/?#]*)([^?#]*)(?:\\?([^#]*))?.*$"
    val scheme0 = lower(regexp_extract(url, pat, 1))
    val scheme = when(scheme0 === "", "http").otherwise(scheme0)
    val auth = regexp_extract(url, pat, 2)
    val host = regexp_replace(
      lower(regexp_extract(auth, "^([^:]*)", 1)), "^www\\.", "")
    val port = regexp_extract(auth, ":([0-9]+)$", 1)
    val keepPort = port =!= "" &&
      !((scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"))
    val path0 = regexp_replace(regexp_extract(url, pat, 3), "/+$", "")
    val path = when(path0 === "", "/").otherwise(path0)
    val params = array_sort(filter(
      split(regexp_extract(url, pat, 4), "&"),
      p => p =!= "" &&
        !p.rlike("^(utm_[^=&]*|gclid|fbclid|ref)(=|$)")))
    concat(scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(""),
      path,
      when(size(params) > 0,
        concat(lit("?"), array_join(params, "&"))).otherwise(""))
  }

  /** Multinomial Naive Bayes classifier, trained and applied in one
    * call — the fasttext/CCNet-style quality-and-language classifier
    * family: learn per-class token log-likelihoods from a labeled
    * slice, score every unlabeled doc, emit the argmax class.
    *
    * Add-one smoothing over the train vocabulary V. For a doc with
    * tokens t₁…tₙ, score(c) = ln P(c) + Σᵢ ln((cnt(tᵢ,c)+1)/(totᶜ+V)).
    * Tokens unseen in class c contribute ln 1 = 0 to the matched sum,
    * so the per-class score decomposes as
    *   prior + Σ_matched ln(cnt+1) − n·ln(totᶜ+V)
    * — the matched sum needs only an INNER join on the token, never a
    * dense doc×vocab expansion. Every log is [[graft.functions.FixedLog]]
    * `lnNano` — integer 1e-9 units computed in pure 64-bit arithmetic —
    * taken BEFORE any sum, so aggregates are order-free and bit-exact
    * on any engine build (no libm in the loop). Tie-break: highest (score, class)
    * pair, i.e. lexicographically largest class wins equal scores —
    * deterministic under any partitioning.
    *
    * 100 TB shape: training is one (class, token)-keyed map-side-
    * combinable aggregate down to vocabulary-cardinality rows; class
    * totals and priors are class-cardinality aggregates joined back by
    * broadcast (the fillPeriod 1-row lazy-scalar pattern); scoring is
    * one explode + one vocabulary-keyed equi-join (partitionable, no
    * broadcast requirement) + one doc-keyed aggregate. Nothing is
    * corpus-quadratic and nothing collects to the driver.
    */
  def naiveBayesClassify(train: DataFrame, score: DataFrame,
      text: Column, id: Column, label: Column): DataFrame =
    // scope-cache the TOKENIZED bases (the near-dup CacheScope rule):
    // five aggregates derive from the train side and two frames from
    // the score side — uncached, each was its own parquet scan of the
    // corpus (a 7-scan plan, caught by PlanAudit round 16)
    graft.core.CacheScope.withPersisted(
      train.select(label.as("_cls"), TextOps.tokens(text).as("_t"))) { tb =>
      graft.core.CacheScope.withPersisted(
        score.select(id.as("doc_id"),
          TextOps.tokens(text).as("_t"))) { sb =>
        val trTok = tb.select(col("_cls"), explode(col("_t")).as("_tok"))
        // vocabulary-sized: per-(class, token) occurrence counts.
        // All log-likelihoods use FixedLog.lnNano — integer-only
        // fixed-point ln, so the DuckDB oracle replays the scores
        // bit-for-bit on ANY build (round-10 driver hash-fail was a
        // libm ln divergence invisible on local DuckDB 1.0.0).
        val w = graft.functions.FixedLog.withLnNano(
          trTok.groupBy(col("_cls"), col("_tok"))
            .agg((count(lit(1)) + lit(1L)).as("_c1")),
          col("_c1"), "_w_nano").drop("_c1")
        // class-cardinality: token totals and doc priors per class
        val tots = trTok.groupBy(col("_cls"))
          .agg(count(lit(1)).as("_tot"))
        val priors = tb.groupBy(col("_cls"))
          .agg(count(lit(1)).as("_ndoc"))
        val grand = trTok.agg(countDistinct(col("_tok")).as("_v"))
          .crossJoin(tb.agg(count(lit(1)).as("_n")))
        val clsBase = tots.join(priors, Seq("_cls"))
          .join(broadcast(grand))
        // prior = ln(ndoc/n) restated as lnNano(ndoc) − lnNano(n):
        // both args integral, so the rational never touches a double
        val clsLn = Seq(("_ndoc", "_ln_ndoc"), ("_n", "_ln_n"),
          ("_bm", "_ln_bm")).foldLeft(
          clsBase.withColumn("_bm", col("_tot") + col("_v"))) {
          case (cur, (in, out)) =>
            graft.functions.FixedLog.withLnNano(cur, col(in), out)
        }
        val classes = clsLn.select(col("_cls"),
          (col("_ln_ndoc") - col("_ln_n")).as("_prior_nano"),
          col("_ln_bm").as("_base_nano"))
        val docs = sb.select(col("doc_id"), col("_t").as("_w"),
          size(col("_t")).cast("long").as("n_tok"))
        // matched log-likelihood mass per (doc, class): inner join — a
        // token absent from a class's vocabulary contributes ln 1 = 0
        val matched = docs
          .select(col("doc_id"), explode(col("_w")).as("_tok"))
          .join(w, Seq("_tok"))
          .groupBy(col("doc_id"), col("_cls"))
          .agg(sum(col("_w_nano")).as("_m_nano"))
        docs.select(col("doc_id"), col("n_tok"))
          .join(broadcast(classes))
          .join(matched, Seq("doc_id", "_cls"), "left_outer")
          .select(col("doc_id"), col("n_tok"), col("_cls"),
            (col("_prior_nano") + coalesce(col("_m_nano"), lit(0L)) -
              col("n_tok") * col("_base_nano")).as("_s_nano"))
          .groupBy(col("doc_id"))
          .agg(max(col("n_tok")).as("n_tok"),
            max(struct(col("_s_nano"), col("_cls"))).as("_best"))
          .select(col("doc_id"), col("n_tok"),
            col("_best._cls").as("pred"),
            col("_best._s_nano").as("score_nano"))
      }
    }

  def sampleWeightedK(df: DataFrame, id: Column, weight: Column, k: Int,
      stratum: Seq[Column]): DataFrame = {
    require(k > 0, s"sampleWeightedK: k must be positive, got $k")
    val u = (TextOps.hash60(id.cast("string")) + lit(0.5)) /
      lit(1152921504606846976.0) // 2^60, exact as a double
    // A-ES requires weight > 0: weight = 0 gives ln(u)/0 = ±Inf keys
    // and weight < 0 inverts the ranking — both silently wrong, so
    // fail the job instead (runtime guard; weights are data-dependent)
    val wpos = when(weight.cast("double") > 0.0, weight.cast("double"))
      .otherwise(raise_error(concat(
        lit("sampleWeightedK: weight must be > 0, got "),
        weight.cast("string"))))
    val key = log(u) / wpos
    if (stratum.isEmpty) {
      df.withColumn("_aes", key).orderBy(col("_aes").desc, id)
        .limit(k).drop("_aes")
    } else {
      val w = Window.partitionBy(stratum: _*).orderBy(col("_aes").desc, id)
      df.withColumn("_aes", key)
        .withColumn("_aes_rn", row_number().over(w))
        .filter(col("_aes_rn") <= k)
        .drop("_aes", "_aes_rn")
    }
  }

  /** Platt calibration (Platt 1999): fit p = σ(a·(s − s̄) + b) turning a
    * raw classifier score into a probability — the step between a
    * trained gate (quality_lr / nb / linear) and any pipeline that
    * THRESHOLDS BY EXPECTED PRECISION rather than raw margin. Training
    * is bit-replayable fixed point, the [[linearClassify]] discipline:
    * hard sigmoid p_milli = clamp(0, 1000, 500 + m div 4000), exact
    * long gradients of the logistic loss ((p − y) count-weighted over
    * the SCORE HISTOGRAM — never the corpus), truncating update steps.
    * Scores center on the truncated train mean so the a/b gradients
    * decouple. Returns per-row (doc_id, p_milli, pred) on the score
    * side.
    *
    * 100 TB shape: ONE map-side-combined (score → np, nn) histogram,
    * scope-cached; each of `iters` steps is one histogram aggregate +
    * a 1-ROW parameter checkpoint (the w-chain pattern, k = 2 longs).
    * Apply is a pure scan with (a, b, s̄) broadcast as a 1-row frame.
    * Histogram cardinality (distinct scores) bounds every per-step
    * operand; gradient sums bound by 1000·N·|sc|max — longs to any
    * realistic labeled-set size.
    */
  def plattCalibrate(train: DataFrame, score: DataFrame, s: Column,
      labelIsPos: Column, id: Column, iters: Int = 15,
      lrNumA: Long = 1L, lrNumB: Long = 16L,
      localHistRows: Long = 1L << 20): DataFrame = {
    require(iters >= 1 && lrNumA >= 1 && lrNumB >= 1,
      "plattCalibrate: iters and learning rates must be >= 1")
    val spark = train.sparkSession
    import spark.implicits._
    val base = train.select(s.cast("long").as("_s"),
      when(labelIsPos, 1000L).otherwise(0L).as("_y"))
    // bounded driver scalars: N and the truncated mean (1-row aggregate)
    val stats = base.agg(count(lit(1)).as("n"), sum(col("_s")).as("ss"))
      .collect()(0)
    val n = stats.getAs[Long]("n")
    require(n > 0, "plattCalibrate: empty train side")
    val sbar = stats.getAs[Long]("ss") / n // trunc toward zero (n > 0)
    graft.core.CacheScope.withPersisted(
      base.withColumn("_sc", col("_s") - sbar)
        .groupBy(col("_sc"))
        .agg(sum(when(col("_y") === 1000L, 1L).otherwise(0L)).as("_np"),
          sum(when(col("_y") === 1000L, 0L).otherwise(1L)).as("_nn"))
    ) { h =>
      // (a, b) live on the driver between steps (2 bounded longs — the
      // linearClassify discipline): each step is ONE 1-row aggregate
      // collect over the cached histogram instead of two broadcast
      // exchanges + a 1-row checkpoint (69 jobs/query measured at
      // iters = 15). Same expressions, same `div` truncation points —
      // the fitted (a, b) are bit-identical to the chained form.
      var a = 0L
      var b = 0L
      val hn = h.count() // histogram cardinality (also warms the cache)
      if (hn <= localHistRows) {
        // bounded-histogram fast path: the whole (sc, np, nn) table is
        // ≤ 2^20 rows of 3 longs (≤ 24 MB — the k-scalars collect
        // class), so all `iters` steps run driver-side with ZERO jobs
        // per step. Same expressions, same truncation points.
        val rows = h.collect().map(r =>
          (r.getAs[Long]("_sc"), r.getAs[Long]("_np"), r.getAs[Long]("_nn")))
        for (_ <- 1 to iters) {
          var ga = 0L
          var gb = 0L
          rows.foreach { case (sc, np, nn) =>
            val p = math.max(0L, math.min(1000L, 500L + (a * sc + b) / 4000L))
            val e = p * (np + nn) - 1000L * np
            ga += e * sc; gb += e
          }
          a -= ga * lrNumA / n
          b -= gb * lrNumB / n
        }
      } else for (_ <- 1 to iters) {
        val g = h
          .withColumn("_p", greatest(lit(0L), least(lit(1000L),
            lit(500L) + expr(s"(${a}L * _sc + ${b}L) div 4000"))))
          .withColumn("_e",
            col("_p") * (col("_np") + col("_nn")) - lit(1000L) * col("_np"))
          .agg(sum(col("_e") * col("_sc")).as("_ga"),
            sum(col("_e")).as("_gb"))
          .head()
        a -= g.getAs[Long]("_ga") * lrNumA / n
        b -= g.getAs[Long]("_gb") * lrNumB / n
      }
      score.select(id.as("doc_id"), s.cast("long").as("_s"))
        .withColumn("p_milli", greatest(lit(0L), least(lit(1000L),
          lit(500L) + expr(s"(${a}L * (_s - ${sbar}L) + ${b}L) div 4000"))))
        .select(col("doc_id"), col("p_milli"),
          (col("p_milli") >= 500L).as("pred"))
    }
  }

  /** Reliability diagram + expected calibration error over a
    * probability column (milli units, 0..1000): `buckets` fixed-width
    * confidence buckets, each with its count, mean predicted
    * probability (conf_milli, trunc), empirical positive rate
    * (acc_milli, trunc) and |gap|; `ece_milli` = Σ n_b·|gap_b| div N
    * attached to every row (1-row broadcast, the fillPeriod
    * lazy-scalar pattern). All-integer — bit-replayable anywhere.
    *
    * 100 TB shape: one map-side-combined aggregate to `buckets` rows +
    * one 1-row total joined back by broadcast. Streams per micro-batch
    * with batch-scoped buckets (corpus-relative ECE needs the corpus).
    */
  def calibrationBuckets(df: DataFrame, probMilli: Column,
      label: Column, buckets: Int = 10): DataFrame = {
    require(buckets >= 1 && buckets <= 1000,
      s"calibrationBuckets: buckets in [1, 1000], got $buckets")
    val p = df.select(probMilli.cast("long").as("_p"),
      when(label, 1L).otherwise(0L).as("_y"))
    // clamp both ends: a probability outside [0, 1000] (caller bug) must
    // land in an edge bucket, not mint a phantom negative-index bucket row
    val b = p.withColumn("bucket",
      greatest(lit(0),
        least(lit(buckets - 1), expr(s"(_p * $buckets) div 1001")))
        .cast("int"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("_p")).as("_sp"),
        sum(col("_y")).as("_ny"))
      .withColumn("conf_milli", expr("_sp div n"))
      .withColumn("acc_milli", expr("(_ny * 1000) div n"))
      .withColumn("gap_milli", abs(col("conf_milli") - col("acc_milli")))
    val tot = b.agg(sum(col("n") * col("gap_milli")).as("_gsum"),
      sum(col("n")).as("_n"))
    b.crossJoin(broadcast(tot))
      .select(col("bucket"), col("n"), col("conf_milli"),
        col("acc_milli"), col("gap_milli"),
        expr("_gsum div _n").as("ece_milli"))
  }

  /** Exact ROC-AUC (Mann–Whitney U, tie-exact) of a score against a
    * binary label — the classifier-eval staple a curation pipeline runs
    * after every quality/NB/linear-classifier training pass. Computed
    * ENTIRELY in integer arithmetic from the score-distinct histogram:
    * per distinct score (np, nn) counts, a global prefix sum of
    * negatives below each score, and
    * `2U = Σ np·(2·negBelow + nn)` — the midrank tie correction falls
    * out exactly (each tied positive scores ties at nn/2, carried as
    * the un-halved integer). `auc_ppm = 2U·10⁶ div (2·n⁺·n⁻)`; emitted
    * with the exact numerator so callers can re-derive at any
    * precision. Returns 1 row: (n_pos, n_neg, u2, auc_ppm) — auc_ppm
    * null when either class is empty.
    *
    * 100 TB shape: one map-side-combined aggregate to score-distinct
    * rows, one [[graft.operators.stateless.GlobalOrder.runningSum]]
    * prefix pass over those rows (never `Window.orderBy` unpartitioned),
    * one 1-row total. Bound: 2U ≤ 2·n⁺·n⁻ must fit a long, i.e.
    * n⁺·n⁻ ≤ ~4.6·10¹⁸ — about 2·10⁹ rows per balanced class (sample
    * upstream past it). The ×10⁶ ppm scaling is done in DECIMAL(38,0)
    * (exact, no long wrap — DuckDB oracle mirrors it in HUGEINT), so
    * the accumulator bound above is the only bound.
    */
  def rocAuc(df: DataFrame, score: Column, label: Column): DataFrame = {
    val s = df.select(score.cast("long").as("sc"),
      when(label, 1L).otherwise(0L).as("_p"))
    val g = s.groupBy(col("sc"))
      .agg(sum(col("_p")).as("np"),
        (count(lit(1)) - sum(col("_p"))).as("nn"))
    val c = graft.operators.stateless.GlobalOrder
      .runningSum(g, Seq(col("sc")), col("nn"), "_cum")
      .withColumn("_below", col("_cum") - col("nn"))
    c.agg(sum(col("np")).as("n_pos"), sum(col("nn")).as("n_neg"),
        sum(col("np") * (col("_below") * 2 + col("nn"))).as("u2"))
      .select(col("n_pos"), col("n_neg"), col("u2"),
        // ×1e6 in DECIMAL(38,0): u2·1e6 wraps a long once u2 > ~9.2e12
        // (a few million rows per class at AUC≈0.5) — decimal keeps the
        // ppm division exact all the way to the accumulator bound
        when(col("n_pos") > 0 && col("n_neg") > 0,
          expr("CAST((CAST(u2 AS DECIMAL(38,0)) * 1000000) div " +
            "(CAST(2 AS DECIMAL(38,0)) * n_pos * n_neg) AS BIGINT)"))
          .as("auc_ppm"))
  }

  /** Precision/recall curve at fixed score thresholds — the other half
    * of the eval loop: pick the score cut that hits a target precision
    * or retention. Per threshold t (predict positive iff score ≥ t):
    * tp/fp/fn counts and exact ppm precision/recall (null when the
    * denominator is 0). Integer-exact, deterministic.
    *
    * 100 TB shape: one explode(|T| literals) + one map-side-combined
    * aggregate to |T| rows — the per-row fan-out collapses in the
    * partial aggregate, nothing data-sized shuffles.
    */
  def prCurve(df: DataFrame, score: Column, label: Column,
      thresholds: Seq[Long]): DataFrame = {
    require(thresholds.nonEmpty, "prCurve: thresholds must be non-empty")
    val s = df.select(score.cast("long").as("sc"),
      when(label, 1L).otherwise(0L).as("_p"))
      .withColumn("thr", explode(array(thresholds.map(lit(_)): _*)))
    s.groupBy(col("thr"))
      .agg(
        sum(when(col("sc") >= col("thr"), col("_p")).otherwise(0L))
          .as("tp"),
        sum(when(col("sc") >= col("thr"), lit(1L) - col("_p"))
          .otherwise(0L)).as("fp"),
        sum(when(col("sc") < col("thr"), col("_p")).otherwise(0L))
          .as("fn"))
      .select(col("thr"), col("tp"), col("fp"), col("fn"),
        when(col("tp") + col("fp") > 0,
          expr("tp * 1000000 div (tp + fp)")).as("prec_ppm"),
        when(col("tp") + col("fn") > 0,
          expr("tp * 1000000 div (tp + fn)")).as("rec_ppm"))
  }

  /** N-gram overlap F1 (the ROUGE-N shape, Lin 2004) between per-row
    * candidate/reference text pairs — the generation-eval metric
    * summarization and paraphrase pipelines gate on, and the
    * train-vs-eval textual-overlap audit decontamination reports use.
    * Counts are CLIPPED (per gram, min(candidate count, reference
    * count) occurrences score — the standard ROUGE clipping, so a
    * candidate repeating one reference gram cannot inflate recall).
    * Exact integer milli-units: `p = overlap·1000 div n_cand`,
    * `r = overlap·1000 div n_ref`, `f1 = overlap·2000 div
    * (n_cand + n_ref)` (algebraically 2PR/(P+R)); all-zero rows when
    * a side has no grams. Tokenization is the library convention
    * (`split(trim, \s+)`), so the DuckDB oracle replays bit-for-bit.
    *
    * 100 TB shape: gram fan-out is a generator; both count tables are
    * map-side-combinable (pair, gram) aggregates; the overlap is one
    * equi-join on (pair, gram) + one (pair) sum — everything keyed,
    * nothing quadratic per row (a HOF min-count over the gram arrays
    * would re-scan per distinct gram). Pairing is the caller's join;
    * this operator never self-joins the corpus.
    */
  def ngramOverlapF1(df: DataFrame, id: Column, cand: Column,
      ref: Column, n: Int): DataFrame = {
    require(n >= 1 && n <= 8, s"ngramOverlapF1: n in [1, 8], got $n")
    val withG = df.select(id.cast("long").as("pair_id"),
      TextOps.shinglesFromTokens(TextOps.tokens(cand), n,
        distinct = false).as("gc"),
      TextOps.shinglesFromTokens(TextOps.tokens(ref), n,
        distinct = false).as("gr"))
    // scope-cache: sizes + both explodes derive from the gram arrays —
    // uncached, three scans re-running tokenization (the PlanAudit rule)
    graft.core.CacheScope.withPersisted(withG) { g =>
      val sizes = g.select(col("pair_id"),
        size(col("gc")).cast("long").as("n_cand"),
        size(col("gr")).cast("long").as("n_ref"))
      val cc = g.select(col("pair_id"), explode(col("gc")).as("g"))
        .groupBy(col("pair_id"), col("g"))
        .agg(count(lit(1)).as("c1"))
      val rc = g.select(col("pair_id"), explode(col("gr")).as("g"))
        .groupBy(col("pair_id"), col("g"))
        .agg(count(lit(1)).as("c2"))
      val ov = cc.join(rc, Seq("pair_id", "g"))
        .groupBy(col("pair_id"))
        .agg(sum(least(col("c1"), col("c2"))).as("overlap"))
      sizes.join(ov, Seq("pair_id"), "left")
        .withColumn("overlap", coalesce(col("overlap"), lit(0L)))
        .select(col("pair_id"), col("overlap"), col("n_cand"),
          col("n_ref"),
          when(col("n_cand") > 0, expr("(overlap * 1000) div n_cand"))
            .otherwise(0L).as("p_milli"),
          when(col("n_ref") > 0, expr("(overlap * 1000) div n_ref"))
            .otherwise(0L).as("r_milli"),
          when(col("n_cand") + col("n_ref") > 0,
            expr("(overlap * 2000) div (n_cand + n_ref)"))
            .otherwise(0L).as("f1_milli"))
    }
  }
}
