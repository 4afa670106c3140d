package graft

import graft.core.{Sessions, Tables}
import graft.operators.join.Joins
import graft.operators.window.Windows
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MiscOpsSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4, "misc-test")
  val sf = "/root/testdata/sf0.001"

  test("Paths.set creates missing intermediate structs (jsn:set semantics)") {
    import spark.implicits._
    import graft.core.Paths
    val df = Seq((1L, 2L)).toDF("a", "b")
      .select(struct(col("a").as("field1"), col("b").as("field2")).as("data"))
    // python_double.dfs: data exists, data.double does not — the write
    // must create the intermediate struct, keeping the siblings
    val out = Paths.set(df, "data.double.field1", Paths.ref("data.field1") * 2)
    assert(out.select(Paths.ref("data.double.field1")).head.getLong(0) == 2L)
    assert(out.select(Paths.ref("data.field1")).head.getLong(0) == 1L)
    assert(out.select(Paths.ref("data.field2")).head.getLong(0) == 2L)
    // a SCALAR intermediate is replaced by a fresh struct (jsn:set)
    val out2 = Paths.set(df, "data.field1.x", lit(9L))
    assert(out2.select(Paths.ref("data.field1.x")).head.getLong(0) == 9L)
  }

  test("GlobalOrder.rowNumber: exactly 1..N, branch-consistent offsets") {
    // the counts branch and the data branch must see the SAME sampled
    // range bounds (exchange reuse) — a mismatch would misnumber rows
    // nondeterministically, so the check is exact equality with the
    // single-plan ground truth, repeated to catch sampling flake
    val ev = Tables.events(spark, sf)
    val expected = ev.orderBy(col("ts_ms"), col("event_id"))
      .select("event_id").collect().map(_.getLong(0)).toSeq
    (1 to 3).foreach { _ =>
      val rn = graft.operators.stateless.GlobalOrder.rowNumber(
        ev, Seq(col("ts_ms"), col("event_id")), "rn")
      val got = rn.orderBy("rn").select("event_id", "rn").collect()
      assert(got.map(_.getLong(0)).toSeq == expected)
      assert(got.map(_.getLong(1)).toSeq == (1L to expected.size).toSeq)
    }
  }

  test("bucketed tables join with zero exchanges (co-located join)") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => a +: flatten(a.executedPlan)
      case _ => p +: p.children.flatMap(flatten)
    }
    // the in-memory catalog forgets tables across JVMs but warehouse
    // files persist — clear both
    Seq("bkt_events", "bkt_users").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      new scala.reflect.io.Directory(
        new java.io.File(s"/tmp/graft-warehouse/$t")).deleteRecursively()
    }
    val ev = Tables.events(spark, sf).select("event_id", "user_id", "value")
    Tables.writeBucketed(ev, "bkt_events", Seq("user_id"), 4)
    Tables.writeBucketed(
      ev.groupBy("user_id").agg(org.apache.spark.sql.functions.avg("value")
        .as("avg_value")),
      "bkt_users", Seq("user_id"), 4)
    // disable broadcast so the assertion proves CO-LOCATION, not just a
    // small build side
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bkt_events")
        .join(spark.table("bkt_users"), "user_id")
      val plan = flatten(joined.queryExecution.executedPlan)
      val shuffles = plan.collect { case e: ShuffleExchangeLike => e }
      assert(shuffles.isEmpty,
        s"expected a shuffle-free co-located join, found: $shuffles")
      assert(plan.exists(_.nodeName.contains("Join")),
        s"no join node in: ${plan.map(_.nodeName).mkString(", ")}")
      assert(joined.count() == ev.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("saltedJoin: row-identical to the plain join; salt reaches the join keys") {
    import graft.operators.join.Skew
    import spark.implicits._
    // one hot key carrying 95% of the left side, plus a long tail
    val skewed = (1 to 2000).map(i => (1L, i.toLong)) ++
      (1 to 100).map(i => (i.toLong + 1, i.toLong))
    val left = skewed.toDF("k", "payload")
    val dim = (1L to 50L).map(i => (i, i * 10)).toDF("k", "v")
    val plain = left.join(dim, "k").as[(Long, Long, Long)]
      .collect().sorted.toSeq
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val salted = Skew.saltedJoin(left, dim, Seq("k"), 8)
      assert(salted.as[(Long, Long, Long)].collect().sorted.toSeq == plain)
      // the physical join keys must include the salt — that's what spreads
      // the hot key over 8 reducers instead of one
      val plan = salted.queryExecution.executedPlan.toString
      assert(plan.contains("_salt"), s"salt column absent from plan:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    // replicated-dim-unsafe join types are rejected, left joins pass
    assert(Skew.saltedJoin(left, dim, Seq("k"), 4, "left").count() == 2100)
    val e = intercept[IllegalArgumentException] {
      Skew.saltedJoin(left, dim, Seq("k"), 4, "full_outer")
    }
    assert(e.getMessage.contains("salt-safe"))
  }

  test("BloomPrune: gate is a superset of matches; pruned join == plain join") {
    import graft.operators.join.BloomPrune
    import spark.implicits._
    val big = (1L to 5000L).map(i => (i, i % 7)).toDF("k", "payload")
    val dim = (1L to 5000L by 50).map(i => (i, i * 2)).toDF("dk", "v")
    // the gate alone: no false negatives (every true match passes), and
    // at fpp=0.01 it actually prunes (pass-set ≪ full set)
    val bytes = BloomPrune.sketch(dim, col("dk"), 1000L, 0.01)
    val pass = big.filter(BloomPrune.mightContain(bytes, col("k")))
      .select("k").as[Long].collect().toSet
    val truth = (1L to 5000L by 50).toSet
    assert(truth.subsetOf(pass), "bloom gate dropped a true match")
    assert(pass.size < 1000, s"gate passed ${pass.size} of 5000 — not pruning")
    // the full pruned join is row-identical to the plain semi join
    val plain = big.join(dim, col("k") === col("dk"), "left_semi")
      .as[(Long, Long)].collect().sorted.toSeq
    val pruned = BloomPrune.prunedJoin(big, col("k"), dim, col("dk"),
      "left_semi", 1000L, 0.01)
    assert(pruned.as[(Long, Long)].collect().sorted.toSeq == plain)
    // the probe is a might_contain gate on the big side (the physical
    // plan folds it into the LocalTableScan for local relations —
    // ConvertToLocalRelation — so pin the analyzed plan; parquet-backed
    // plans keep it physical, which PlanLint covers via join_bloom_semi)
    val plan = pruned.queryExecution.analyzed.toString
    assert(plan.contains("might_contain"), s"no bloom probe in plan:\n$plan")
    // outer probes must be rejected — the gate drops unmatched rows
    val e = intercept[IllegalArgumentException] {
      BloomPrune.prunedJoin(big, col("k"), dim, col("dk"), "left_outer")
    }
    assert(e.getMessage.contains("inner/left_semi"))
  }

  test("bucketed LSH index: vs-index probe shuffles only the arriving side") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import graft.operators.text.Dedup
    def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => a +: flatten(a.executedPlan)
      case _ => p +: p.children.flatMap(flatten)
    }
    spark.sql("DROP TABLE IF EXISTS bkt_lsh_idx")
    new scala.reflect.io.Directory(
      new java.io.File("/tmp/graft-warehouse/bkt_lsh_idx")).deleteRecursively()
    val docs = Tables.documents(spark, sf)
    // the 100 TB layout: the index is WRITTEN bucketed on its join key
    // (band, bh), so an arrival batch pays its own (small) shuffle while
    // the corpus-sized index is read in place — no corpus movement
    Tables.writeBucketed(
      Dedup.nearDupIndex(docs.filter(col("doc_id") % 7 =!= 0),
        col("text"), col("doc_id")),
      "bkt_lsh_idx", Seq("band", "bh"), 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val probed = Dedup.nearDupVsIndex(
        docs.filter(col("doc_id") % 7 === 0), col("text"), col("doc_id"),
        spark.table("bkt_lsh_idx"), 0.3)
      val plan = flatten(probed.queryExecution.executedPlan)
      val bucketedScanSubtrees = plan.collect {
        case s if s.nodeName.contains("Scan") &&
          s.toString.contains("bkt_lsh_idx") => s
      }
      assert(bucketedScanSubtrees.nonEmpty, "bucketed index scan missing")
      // no exchange may sit between the join and the bucketed scan —
      // walk down from each join child containing the index scan
      val joins = plan.filter(_.nodeName.contains("SortMergeJoin"))
      assert(joins.nonEmpty, s"expected a sort-merge probe join:\n$plan")
      val indexSideShuffles = joins.flatMap(_.children).filter(
        c => c.toString.contains("bkt_lsh_idx")).flatMap(c =>
        flatten(c).collect { case e: ShuffleExchangeLike => e })
      assert(indexSideShuffles.isEmpty,
        s"index side shuffles despite bucketing: $indexSideShuffles")
      // semantics unchanged vs the computed index
      val direct = Dedup.nearDupVsIndex(
        docs.filter(col("doc_id") % 7 === 0), col("text"), col("doc_id"),
        Dedup.nearDupIndex(docs.filter(col("doc_id") % 7 =!= 0),
          col("text"), col("doc_id")), 0.3)
        .collect().map(_.toSeq).toSet
      assert(probed.collect().map(_.toSeq).toSet == direct)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("seriesTopK: z-norm match ranks exact shape first; short keys drop") {
    import graft.operators.series.Series
    import spark.implicits._
    // key 1: the query shape scaled+shifted (z-norm dist 0); key 2:
    // reversed ramp (max dist); key 3: flat (zero vector); key 4: too
    // few points (dropped)
    val m = 8
    val rows =
      (1 to m).map(i => (1L, i.toLong, i.toLong, 100.0 + 5 * i)) ++
      (1 to m).map(i => (2L, i.toLong, i.toLong, (m - i).toDouble)) ++
      (1 to m).map(i => (3L, i.toLong, i.toLong, 7.0)) ++
      (1 to 3).map(i => (4L, i.toLong, i.toLong, i.toDouble))
    val df = rows.toDF("user_id", "ts_ms", "event_id", "value")
    val q = (1 to m).map(_.toDouble)
    val got = Series.seriesTopK(df, col("user_id"),
      Seq(col("ts_ms"), col("event_id")), col("value"), q, 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(got.map(_._1).toSeq == Seq(1L, 3L, 2L), s"order wrong: ${got.toSeq}")
    assert(got.head._2 == 0.0)
    // flat series z-normalizes to the zero vector: dist = ||q'|| = sqrt(m)
    val qn = Series.zNormQuery(q)
    val expFlat = BigDecimal(math.sqrt(qn.map(v => v * v).sum))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1)._2 == expFlat)
    // the last-m cut really takes the LAST m: key 1 with a leading
    // outlier older than the window is unaffected
    val df2 = (Seq((1L, 0L, 0L, 9999.0)) ++ rows)
      .toDF("user_id", "ts_ms", "event_id", "value")
    val got2 = Series.seriesTopK(df2, col("user_id"),
      Seq(col("ts_ms"), col("event_id")), col("value"), q, 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(got2.head == (1L -> 0.0))
  }

  test("bestMatch: finds the planted window offset; earliest wins ties") {
    import graft.operators.series.Series
    import spark.implicits._
    val m = 8
    val q = (1 to m).map(_.toDouble)
    // key 1: noise, then the ramp (scaled ×3, shifted +50) at offset 11,
    // then noise — the z-norm match must land exactly there with dist 0
    val vals1 = Seq(5.0, 9.0, 2.0, 7.0, 1.0, 8.0, 3.0, 6.0, 4.0, 9.5) ++
      q.map(v => 50.0 + 3 * v) ++ Seq(2.5, 7.5)
    // key 2: the ramp appears TWICE (offsets 1 and 9) — earliest wins
    val vals2 = q ++ q ++ Seq(0.0)
    val rows = vals1.zipWithIndex.map { case (v, i) =>
      (1L, i.toLong, i.toLong, v) } ++
      vals2.zipWithIndex.map { case (v, i) => (2L, i.toLong, i.toLong, v) }
    val series = Series.fullSeries(rows.toDF("k", "ts_ms", "eid", "v"),
      col("k"), Seq(col("ts_ms"), col("eid")), col("v"))
    val got = Series.bestMatch(series, Series.zNormQuery(q))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2))))
      .toMap
    assert(got(1L) == ((11, 0.0)), s"got ${got(1L)}")
    assert(got(2L) == ((1, 0.0)), s"got ${got(2L)}")
    // the native scan matches the interpreted HOF twin exactly —
    // selection runs on raw d², so any ulp divergence between the two
    // implementations would flip an offset
    val hof = Series.bestMatchHof(series, Series.zNormQuery(q))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    val nat = Series.bestMatch(series, Series.zNormQuery(q))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    assert(nat == hof)
  }

  test("withSax: ramp maps to 'abcd', flat to 'cccc', scale-invariant") {
    import graft.operators.series.Series
    import spark.implicits._
    val rows =
      (1 to 16).map(i => (1L, i.toLong, i.toLong, i.toDouble)) ++      // ramp
      (1 to 16).map(i => (2L, i.toLong, i.toLong, 42.0)) ++            // flat
      (1 to 16).map(i => (3L, i.toLong, i.toLong, 1000.0 + 50 * i)) ++ // ramp ×50
      (1 to 16).map(i => (4L, i.toLong, i.toLong, (17 - i).toDouble))  // fall
    val series = Series.keySeries(rows.toDF("k", "ts_ms", "eid", "v"),
      col("k"), Seq(col("ts_ms"), col("eid")), col("v"), 16)
    val got = Series.withSax(series, 4, 4)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got(1L) == "abcd", s"ramp: ${got(1L)}")
    // flat z-normalizes to zeros; 0 sits in the ['b','c') band edge —
    // 0 < 0 is false, 0 < 0.6745 true -> 'c'
    assert(got(2L) == "cccc", s"flat: ${got(2L)}")
    // z-normalization makes the word scale/offset invariant
    assert(got(3L) == "abcd", s"scaled ramp: ${got(3L)}")
    assert(got(4L) == "dcba", s"falling ramp: ${got(4L)}")
  }

  test("mergeValues: numbers add, strings concat, nulls coalesce") {
    import spark.implicits._
    val df = Seq((1.0, 2.0, "a", "b"), (3.0, 4.0, "c", "d"))
      .toDF("x", "y", "s", "t")
    val m = Joins.mergeValues(Joins.mergeValues(df, "x", "y", "sum"),
      "s", "t", "cat")
    val r = m.orderBy("x").collect()
    assert(r(0).getDouble(4) == 3.0 && r(0).getString(5) == "ab")
    val withNull = Seq((Some(1.0), None: Option[Double]))
      .toDF("x", "y")
    assert(Joins.mergeValues(withNull, "x", "y", "m")
      .head().getDouble(2) == 1.0)
  }

  test("rename handles deep paths and missing sources") {
    import spark.implicits._
    val df = Seq((1L, 2L)).toDF("a", "b")
      .withColumn("nest", struct(lit(5L).as("v")))
    val out = graft.operators.stateless.Transforms.rename(df, Seq(
      "a" -> "a2",            // top-level
      "nest.v" -> "nest.w",   // deep move
      "missing" -> "m"))      // no-op
    assert(out.columns.contains("a2") && !out.columns.contains("missing"))
    assert(out.select(col("nest.w")).head().getLong(0) == 5L)
    assert(!graft.core.Paths.has(out, "nest.v"))
  }

  test("win_clock groups by ingest time (processing-time policy)") {
    val out = Windows.clockAgg(
      Tables.events(spark, sf), "1 hour", Seq(col("event_type")),
      Seq(count(lit(1)).as("n")))
    // all rows ingest within the same wall-clock hour bucket or two
    assert(out.count() >= 5) // one row per event_type at least
    assert(out.agg(sum(col("n"))).head().getLong(0) ==
      Tables.events(spark, sf).count())
  }

  test("win_clock sliding form: period > every emits overlapping windows") {
    // esp_win_clock.erl: .period is the window length, .every the emit
    // interval. All rows ingest at (nearly) one instant, so each lands in
    // exactly period/every = 3 sliding windows; window length stays
    // period in every emitted window.
    val out = Windows.clockAgg(
      Tables.events(spark, sf).limit(50), "15 seconds",
      Seq(col("event_type")), Seq(count(lit(1)).as("n")),
      slide = Some("5 seconds"))
    val perWin = out.groupBy("window_start_ms", "window_end_ms")
      .agg(sum("n")).collect()
    assert(perWin.length >= 3)
    assert(perWin.forall(r => r.getLong(1) - r.getLong(0) == 15000L))
  }

  test("rename/set match flowdata_tests.erl deep-path cases") {
    import spark.implicits._
    import graft.operators.stateless.Transforms
    val p = Seq(("somestring", 44)).toDF("val", "var")
    // rename_field_basic_test: flat source -> deep target nests; the old
    // name is gone
    val r1 = Transforms.rename(p, Seq("val" -> "value.into.deep"))
    assert(!r1.columns.contains("val") && r1.columns.contains("var"))
    assert(r1.select("value.into.deep").head.getString(0) == "somestring")
    // rename_field_undefined_test: a missing source is skipped, the rest
    // still applies
    val r2 = Transforms.rename(p,
      Seq("val" -> "value.into.deep", "value" -> "my_value"))
    assert(!r2.columns.contains("my_value"))
    assert(r2.select("value.into.deep").head.getString(0) == "somestring")
    // rename_field_empty_path_test: no renames -> unchanged
    assert(Transforms.rename(p, Nil).columns.toSeq == p.columns.toSeq)
    // set_field_deep_test: deep set creates intermediate structs and
    // keeps siblings
    val s1 = graft.core.Paths.set(p, "value.into.deep", lit("new"))
    assert(s1.select("value.into.deep").head.getString(0) == "new")
    assert(s1.select("val").head.getString(0) == "somestring")
  }

  test("array-indexed delete/rename: flowdata's [n] addressing, " +
      "relational analog") {
    import spark.implicits._
    import graft.operators.stateless.Transforms
    import graft.core.Paths
    // rename_field_deep_array_index_test (flowdata_tests.erl:263-271):
    // rename val.foo.bar[1].first -> .erster inside the addressed
    // element. The reference's dynamic maps remove the old key from that
    // one element; relationally all elements share a schema, so the old
    // field stays as NULL in the addressed element (the engine's
    // documented NULL ≈ absent-key convention) and the new field lands
    // NULL everywhere else.
    val df = spark.range(1).select(
      struct(struct(array(
        struct(lit(1).as("first")),
        struct(lit(2).as("first")),
        struct(lit(3).as("first"))).as("bar")).as("foo")).as("val"),
      lit(44).as("var"))
    val ren = Transforms.rename(df,
      Seq("val.foo.bar[1].first" -> "val.foo.bar[1].erster"))
    val bar = ren.select(col("val.foo.bar")).head
      .getSeq[org.apache.spark.sql.Row](0)
    assert(bar.map(r => Option(r.get(r.fieldIndex("erster")))) ==
      Seq(Some(1), None, None))
    assert(bar.map(r => Option(r.get(r.fieldIndex("first")))) ==
      Seq(None, Some(2), Some(3)))
    assert(ren.select("var").head.getInt(0) == 44)
    // tail-position [n] delete removes the ELEMENT (jsn list semantics)
    val cut = Paths.delete(df, "val.foo.bar[2]")
    assert(cut.select(col("val.foo.bar")).head
      .getSeq[org.apache.spark.sql.Row](0).map(_.getInt(0)) == Seq(1, 3))
    // mid-path [n] delete NULLs the field in the addressed element only
    val nulled = Paths.delete(df, "val.foo.bar[3].first")
    assert(nulled.select(col("val.foo.bar")).head
      .getSeq[org.apache.spark.sql.Row](0)
      .map(r => Option(r.get(0))) == Seq(Some(1), Some(2), None))
    // jsn_set_basic_test (jsn_tests.erl): set data.bar[2] on a 1-element
    // list EXTENDS the list — the new element lands in slot 2
    val one = spark.range(1).select(
      struct(array(struct(lit(1).as("first"))).as("bar")).as("data"))
    val ext = Paths.set(one, "data.bar[2].first", lit(2))
    assert(ext.select(col("data.bar")).head
      .getSeq[org.apache.spark.sql.Row](0)
      .map(r => Option(r.get(0))) == Seq(Some(1), Some(2)))
    // and far past the end: null slots pad up to the target (fresh()'s
    // i-slot shape)
    val far = Paths.set(one, "data.bar[4].first", lit(4))
    assert(far.select(col("data.bar")).head
      .getSeq[org.apache.spark.sql.Row](0)
      .map(r => Option(r).flatMap(x => Option(x.get(0)))) ==
      Seq(Some(1), None, None, Some(4)))
  }

  test("change_detect matches esp_change_detect.erl's eunit semantics") {
    import spark.implicits._
    import graft.operators.state.StateOps
    // monitored-fields form (check/4): EVERY defined monitored field
    // must change; one equal field vetoes the point
    // (process_point_monitor_one_lastequal_test)
    val rows = Seq(
      (1L, Some(1.0), Some(1.343)),  // first row: passes (no last values)
      (2L, Some(2.0), Some(1.343)),  // val changed, val1 EQUAL -> veto
      (3L, Some(3.0), Some(9.9)),    // both changed -> passes
      (4L, None, Some(8.8)),         // val undefined -> no veto from it; val1 changed -> passes
      (5L, Some(3.0), Some(8.8))     // LAST val undefined -> no veto; val1 equal -> veto
    ).toDF("seq", "val", "val1")
    val mon = StateOps.changeDetectMonitored(rows,
      Seq(col("val"), col("val1")), Nil, Seq(col("seq")))
      .select("seq").as[Long].collect().toSet
    assert(mon == Set(1L, 3L, 4L))
    // whole-point form: map equality — identical consecutive row is
    // suppressed, ANY difference passes, first row passes
    val whole = StateOps.changeDetect(
      Seq((1L, 1.0, "a"), (2L, 1.0, "a"), (3L, 1.0, "b"), (4L, 1.0, "b"))
        .toDF("seq", "v", "t").withColumn("one", lit(1)),
      Seq(col("v"), col("t")), Nil, Seq(col("seq")))
      .select("seq").as[Long].collect().toSet
    assert(whole == Set(1L, 3L))
  }

  test("percentile matches esp_percentile.erl's eunit (rank p·n, not p·(n−1))") {
    import spark.implicits._
    import graft.operators.agg.AggFunctions
    // basic_perc_test: percentile([12.4,16.8,23,23.9,25.9,12.2], 70) == 23.18
    // (quantile_cont would give 23.45 — rank p·(n−1) — the wrong method)
    val vals = Seq(12.4, 16.8, 23.0, 23.9, 25.9, 12.2).toDF("v")
    val got = vals.agg(AggFunctions.percentile(col("v"), 0.70)).head.getDouble(0)
    assert(math.abs(got - 23.18) < 1e-9, s"got $got")
    // p=0 → min, p=1 → max (esp_percentile.erl:63-64)
    assert(vals.agg(AggFunctions.percentile(col("v"), 0.0)).head.getDouble(0) == 12.2)
    assert(vals.agg(AggFunctions.percentile(col("v"), 1.0)).head.getDouble(0) == 25.9)
    // R < 1 (reference's lists:nth(0) crash): SQL form returns the min
    assert(vals.agg(AggFunctions.percentile(col("v"), 0.05)).head.getDouble(0) == 12.2)
    // multi-quantile form agrees with the scalar form
    val multi = vals.agg(AggFunctions.percentiles(col("v"), Seq(0.70, 1.0)))
      .head.getSeq[Double](0)
    assert(math.abs(multi.head - 23.18) < 1e-9 && multi(1) == 25.9)
  }

  test("keep matches esp_keep.erl's eunit rewrite cases") {
    import spark.implicits._
    import graft.operators.stateless.Transforms
    // rewrite_point_test: flat field, alias
    val flat = Seq((2134L, "get")).toDF("value", "val44")
    val r1 = Transforms.keep(flat, Seq("val44" -> Some("val")))
    assert(r1.columns.toSeq == Seq("val") && r1.head.getString(0) == "get")

    val nested = Seq((2134L, "get")).toDF("value", "val44")
      .select(struct(col("value"), col("val44")).as("first"))
    // rewrite_points_path_test: deep source, flat alias
    val r2 = Transforms.keep(nested, Seq("first.val44" -> Some("val")))
    assert(r2.columns.toSeq == Seq("val") && r2.head.getString(0) == "get")
    // rewrite_points_path_no_aliases_test: deep source keeps its nesting
    val r3 = Transforms.keep(nested, Seq("first.val44" -> None))
    assert(r3.columns.toSeq == Seq("first"))
    assert(r3.select("first.val44").head.getString(0) == "get")
    assert(r3.schema("first").dataType.asInstanceOf[
      org.apache.spark.sql.types.StructType].fieldNames.toSeq == Seq("val44"))
    // rewrite_points_path_alias_path_test: the ALIAS is a path too
    val r4 = Transforms.keep(nested, Seq("first.val44" -> Some("erster.val")))
    assert(r4.columns.toSeq == Seq("erster"))
    assert(r4.select("erster.val").head.getString(0) == "get")
    // rewrite_points_no_undefined_test: absent sources drop with alias
    val r5 = Transforms.keep(nested, Seq(
      "first.val44" -> Some("erster.val"), "someother.field" -> Some("some.field")))
    assert(r5.columns.toSeq == Seq("erster"))
    assert(r5.select("erster.val").head.getString(0) == "get")
  }

  test("Tables.events accepts all three parquet timestamp provenances") {
    import spark.implicits._
    // the corpus ships TIMESTAMP(NANOS) (read as long), but a deployment
    // corpus can carry adjusted-to-UTC micros or NTZ (DuckDB's default
    // TIMESTAMP) — all three must normalize to the same ts/ts_ms/ts_ns
    val base = Tables.events(spark, sf)
      .select("event_id", "ts", "ts_ms", "ts_ns").orderBy("event_id")
    val expected = base.limit(5).collect()

    val dir = java.nio.file.Files.createTempDirectory("evprov").toString
    // micros, UTC-adjusted (Spark's native TimestampType)
    base.limit(5).select(col("event_id"), col("ts"))
      .write.mode("overwrite").parquet(s"$dir/utc/events.parquet")
    // NTZ: same wall-clock instants, no zone tag
    base.limit(5)
      .select(col("event_id"), col("ts").cast("timestamp_ntz").as("ts"))
      .write.mode("overwrite").parquet(s"$dir/ntz/events.parquet")
    Seq("utc", "ntz").foreach { prov =>
      val got = Tables.events(spark, s"$dir/$prov")
        .select("event_id", "ts", "ts_ms", "ts_ns").orderBy("event_id")
        .collect()
      // ns precision below micros is lost on the timestamp provenances —
      // compare at the micro grain the parquet actually carries
      expected.zip(got).foreach { case (e, g) =>
        assert(e.getLong(0) == g.getLong(0), prov)
        assert(e.getTimestamp(1) == g.getTimestamp(1), prov)
        assert(e.getLong(2) == g.getLong(2), s"$prov ts_ms")
        assert(e.getLong(3) / 1000 == g.getLong(3) / 1000, s"$prov ts_ns")
      }
    }
  }
}
