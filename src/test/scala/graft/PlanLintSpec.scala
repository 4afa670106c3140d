package graft

import graft.core.Sessions
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.WindowExec
import org.scalatest.funsuite.AnyFunSuite

/** Structural lint over EVERY registered query's physical plan — the
  * scale anti-patterns the engine bans must stay banned:
  *  - no WindowExec without partition columns (single-task global sort);
  *  - no CartesianProductExec (the only sanctioned cross join is the
  *    broadcast top-k, which compiles to BroadcastNestedLoopJoin).
  */
class PlanLintSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4, "plan-lint")
  val sf = "/root/testdata/sf0.001"

  private def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
    // an AQE node is a barrier: it has NO children — descend explicitly
    // through its current physical plan or the whole walk is vacuous
    case a: AdaptiveSparkPlanExec => a +: flatten(a.executedPlan)
    case _ => p +: (p.children ++ p.subqueries).flatMap(flatten)
  }

  test("no query plan contains a global (unpartitioned) window") {
    val offenders = SparkEntry.queries.flatMap { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan
      flatten(plan).collect {
        case w: WindowExec if w.partitionSpec.isEmpty => name
      }
    }.toSet
    assert(offenders.isEmpty,
      s"global-sort windows in: ${offenders.mkString(", ")}")
  }

  test("no query plan contains a cartesian product") {
    val offenders = SparkEntry.queries.flatMap { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan
      flatten(plan).collect { case _: CartesianProductExec => name }
    }.toSet
    assert(offenders.isEmpty,
      s"cartesian products in: ${offenders.mkString(", ")}")
  }

  test("as-of join family keeps its single-shuffle formulation") {
    // the README's headline scale claim, pinned mechanically: the
    // union + running-last as-of join is ONE hash-partition exchange on
    // the stream key (≤2 tolerated for incidental source-side shuffles)
    val family = Seq("join_asof", "join_asof_tol", "join_nearest",
      "dfs_join", "dfs_join_outer", "dfs_join_merge")
    val counts = family.map { name =>
      val plan = SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan
      name -> flatten(plan).count(
        _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike])
    }
    val over = counts.filter(_._2 > 2)
    assert(over.isEmpty, s"as-of joins grew extra shuffles: $over")
  }

  test("bloom-pruned join keeps its might_contain gate on the fact scan") {
    // the gate must survive optimization and sit on the FACT side —
    // i.e. evaluate before the join (and before any exchange the join
    // needs), which is the whole point: non-matching rows die at scan
    val plan = SparkEntry.queries("join_bloom_semi")(spark, sf)
      .queryExecution.executedPlan
    val filters = flatten(plan).collect {
      case f: org.apache.spark.sql.execution.FilterExec
        if f.condition.toString.contains("might_contain") => f
    }
    assert(filters.nonEmpty, s"no might_contain filter in:\n$plan")
    // the gated filter scans lineitem directly (no join below it)
    assert(filters.forall(f =>
      !flatten(f.child).exists(_.nodeName.contains("Join"))),
      "bloom gate is not on the pre-join fact side")
  }

  test("broadcast nested-loop joins only where sanctioned (guarded top-k)") {
    // Sanctioned shapes: bruteTopK's crossJoin(broadcast(q)) and
    // cosineDupPairsExact's a < b self-join — all-pairs by spec, both
    // fail fast past MaxBroadcastQueries — and fillPeriod's
    // conditionless join against a broadcast 1-ROW min-aggregate (the
    // lazy scalar-subquery form; Windows.fillPeriod). sampleToMixture
    // broadcasts its 1-ROW totals aggregate the same way (N and ΣW
    // against the per-stratum counts — both sides bounded by stratum
    // cardinality). Anywhere else a BNLJ means an equi-join lost its
    // keys.
    val sanctioned = Set("emb_cosine_topk", "dedup_cosine_exact",
      "win_time_fill_period", "text_sample_weighted",
      "dfs_sample_mixture",
      // mixtureRatesTemp broadcasts the same 1-ROW (N, Σn^α) totals
      // aggregate as sampleToMixture
      "text_mixture_temp", "dfs_mixture_temp",
      // hammingTopK inherits bruteTopK's guarded crossJoin(broadcast(q))
      // — and its corpus side is ONE long per row past the scan
      "emb_hamming_topk", "emb_hamming_rerank", "emb_hard_negatives",
      // rrfFuse's INPUT rankings inherit bruteTopK/hammingTopK's
      // guarded crossJoin(broadcast(q)); the fusion itself is an
      // equi-keyed aggregate over queries×k rank rows
      "emb_rrf_fuse", "dfs_rrf_fuse",
      // the cross-path hybrid's dense arm is bruteTopK's guarded
      // crossJoin(broadcast(q)); the sparse arm is the equi-keyed
      // BM25 chain, the fuse an equi-keyed aggregate
      "text_hybrid_retrieval", "dfs_hybrid_retrieval",
      // corpusReport joins its 1-ROW grand-total aggregate back by
      // broadcast (the domainStats pattern)
      "text_corpus_report", "dfs_corpus_report",
      "dfs_hamming_topk",
      // bm25TopK broadcasts its 1-ROW corpus-stats aggregate (N, avgdl,
      // per-term df) — the fillPeriod lazy-scalar pattern
      "text_bm25", "dfs_bm25",
      // pqTopK broadcasts its guarded query side like bruteTopK; the
      // corpus side past the join is CODES ONLY (m ints/row)
      "emb_pq_topk",
      // knnLabel inherits bruteTopK's guarded crossJoin(broadcast(q));
      // domainStats joins its 1-ROW grand-total aggregate back by
      // broadcast (the fillPeriod lazy-scalar pattern)
      "emb_knn_label", "dfs_knn_label", "text_domain_mix",
      // vocabCoverage: histogram-sized non-equi self-join + 1-ROW total
      // — both sides count-value-cardinality-bounded
      "text_vocab", "dfs_vocab",
      // DSIR broadcasts its 1-ROW totals (unseen-bucket fallback) and,
      // in the selection form, the 1-ROW percentile threshold — both
      // the fillPeriod lazy-scalar pattern
      "text_dsir", "dfs_dsir",
      // upsampleRates crossJoins the same 1-ROW (N, ΣW) totals
      // aggregate as mixtureRates
      "text_mixture_epochs", "dfs_mixture_epochs",
      // tokenKlDrift broadcasts its 1-ROW (N_before, N_after, |V|)
      // totals — the fillPeriod lazy-scalar pattern
      "text_kl_drift", "dfs_kl_drift",
      // naiveBayesClassify broadcasts its 1-ROW (V, N) grand totals and
      // the class-cardinality (prior, base) table — both bounded by
      // label cardinality, the fillPeriod lazy-scalar pattern
      "text_nb_classify", "dfs_nb_classify",
      // pcaPowerTop broadcasts its 1-ROW L∞ bounds (m, m2) each
      // iteration, and covarianceFixed its 1-ROW n — d²-row operands,
      // the fillPeriod lazy-scalar pattern
      "emb_pca_project", "dfs_pca_project", "emb_cov", "dfs_cov",
      // quantileBuckets broadcasts its 1-ROW count (the ntile divisor);
      // the chain query inherits it
      "text_quantile_bucket", "dfs_quantile_bucket",
      "dfs_curation_chain", "dfs_quality_chain",
      // hllDistinct's global form crossJoins its 1-ROW estimate with
      // the 1-ROW exact-count yardstick; corpusJaccardEst crossJoins
      // three 1-ROW aggregates (sig A, sig B, exact overlap) — all the
      // fillPeriod lazy-scalar pattern
      "text_hll_distinct", "dedup_corpus_jaccard", "dfs_corpus_jaccard",
      // marginPairs inherits bruteTopK's guarded crossJoin(broadcast)
      // for its ONE scored pair table (both direction windows reuse it)
      "emb_margin_pairs", "dfs_margin_pairs",
      // plattCalibrate broadcasts its 1-ROW (a, b) parameter frame at
      // apply; calibrationBuckets its 1-ROW ECE total — both the
      // fillPeriod lazy-scalar pattern
      "text_platt", "dfs_platt", "text_ece", "dfs_ece",
      // semanticDeconExact is the guarded all-pairs yardstick: the
      // benchmark side is eval-set-sized and broadcast (fails fast past
      // MaxBroadcastQueries), the cosineDupPairsExact convention
      "emb_semantic_decon_exact")
    val offenders = SparkEntry.queries.flatMap { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan
      flatten(plan).collect {
        case _: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
          if !sanctioned(name) => name
      }
    }.toSet
    assert(offenders.isEmpty,
      s"unsanctioned broadcast nested-loop joins in: ${offenders.mkString(", ")}")
  }

  test("no registered query returns an array/map-typed column") {
    // The driver's pandas oracle harness sorts result frames on every
    // column and cannot sort list cells (emb_quantize failed there in
    // round 8 while the local harness silently stringified). Contract:
    // every registered query serializes collections (concat_ws) before
    // returning. Complex-type columns are fine INSIDE a plan — only the
    // final schema is constrained.
    val offenders = SparkEntry.queries.flatMap { case (name, fn) =>
      complexCols(fn(spark, sf)).map(c => s"$name.$c")
    }.toSeq.sorted
    assert(offenders.isEmpty,
      s"array/map-typed result columns in: ${offenders.mkString(", ")}")
  }

  test("the complex-type lint itself rejects an array-returning frame") {
    import spark.implicits._
    val bad = Seq((1, Seq(1, 2))).toDF("id", "vals")
    assert(complexCols(bad) == Seq("vals"))
    val badMap = bad.select(col("id"),
      org.apache.spark.sql.functions.map(lit("k"), col("id")).as("m"))
    assert(complexCols(badMap) == Seq("m"))
  }

  private def complexCols(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] ||
        f.dataType.isInstanceOf[org.apache.spark.sql.types.MapType] => f.name
    }.toSeq

  test("poll windows push their range into the parquet scan") {
    // a derived-ms filter pushes only IsNotNull — every poll would
    // full-scan at 100 TB. The poll paths must filter the RAW ns column.
    Seq("poll_incremental", "poll_bucketed").foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(plan.contains("GreaterThanOrEqual(ts,"),
        s"$name: no pushed lower bound on the raw ts column")
      assert(plan.contains("LessThan(ts,"),
        s"$name: no pushed upper bound on the raw ts column")
    }
  }

  test("fill_period query CONSTRUCTION triggers no Spark job") {
    // Windows.fillPeriod must stay lazy: an eager bound (.head at plan
    // time) would be a full extra source scan per planned query at
    // 100 TB. Constructing the DataFrame may analyze but must not run.
    // spark.read.parquet legitimately runs a tiny footer-read job for
    // schema inference at construction; what must NOT appear is an
    // action-driven job (the old `.head` bound = a full source scan)
    val actions = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        // the schema-inference job may come from a worker thread with no
        // local properties — identify it by its stage callsite instead
        val stages = js.stageInfos.map(_.name)
        if (!stages.forall(_.startsWith("parquet at")))
          actions.add(stages.mkString(";"))
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      SparkEntry.queries("win_time_fill_period")(spark, sf) // construct only
      Thread.sleep(1000) // listener bus is async
      assert(actions.isEmpty,
        s"query construction launched action job(s): $actions")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
