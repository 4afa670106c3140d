package graft

import graft.core.Sessions
import graft.streaming.Streaming
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

case class Ev(user_id: Long, seq: Long, value: Double, event_type: String)

/** Streaming forms driven through MemoryStream — the esp_batch.erl flush
  * semantics and keyed-state operators under a real streaming query.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4, "streaming-test")

  private def runStream[T](name: String)(build: MemoryStream[Ev] =>
      org.apache.spark.sql.Dataset[T])(data: Seq[Ev]): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = build(in).writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    in.addData(data)
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  test("countBatch emits full batches, buffers the remainder") {
    import spark.implicits._
    val data = (1L to 7L).map(i => Ev(1, i, i.toDouble, "a")) ++
      (1L to 3L).map(i => Ev(2, i, i.toDouble, "b"))
    val out = runStream("cb")(in =>
      Streaming.countBatch[Long, Ev](in.toDS(), _.user_id, 3)
        .map { case (k, vs) => (k, vs.size, vs.map(_.seq).toArray) })(data)
    val rows = out.collect()
    // user 1: 7 points -> two emitted batches of 3 (1 buffered);
    // user 2: 3 points -> one batch
    assert(rows.count(_.getLong(0) == 1L) == 2)
    assert(rows.count(_.getLong(0) == 2L) == 1)
    assert(rows.forall(_.getInt(1) == 3))
  }

  test("countBatch on a plain batch Dataset (no stream) works too") {
    import spark.implicits._
    val ds = (1L to 10L).map(i => Ev(i % 2, i, i.toDouble, "x")).toDS()
    val out = Streaming.countBatch[Long, Ev](ds, _.user_id, 2).collect()
    assert(out.length == 4) // 5 per key -> two full batches each
    assert(out.forall(_._2.size == 2))
  }

  test("changeDetect emits only value changes per key") {
    import spark.implicits._
    val data = Seq(
      Ev(1, 1, 1.0, "a"), Ev(1, 2, 1.0, "a"), Ev(1, 3, 2.0, "b"),
      Ev(1, 4, 2.0, "b"), Ev(1, 5, 1.0, "a"),
      Ev(2, 1, 9.0, "z"))
    val out = runStream("cd")(in =>
      Streaming.changeDetect[Long, Ev, String](in.toDS(), _.user_id, _.event_type))(data)
    val seqs = out.as[Ev].collect().map(e => (e.user_id, e.seq)).toSet
    assert(seqs == Set((1L, 1L), (1L, 3L), (1L, 5L), (2L, 1L)))
  }

  test("collectLatest upserts on add and evicts on remove") {
    import spark.implicits._
    val data = Seq(
      Ev(1, 1, 1.0, "add"), Ev(1, 2, 2.0, "add"),
      Ev(1, 3, 0.0, "remove"), Ev(1, 4, 4.0, "add"))
    val out = runStream("cl")(in =>
      Streaming.collectLatest[Long, Ev](in.toDS(), _.user_id,
        add = _.event_type == "add", remove = _.event_type == "remove"))(data)
    val seqs = out.as[Ev].collect().map(_.seq).toSet
    assert(seqs == Set(1L, 2L, 4L))
  }

  test("collect upsert: streaming emissions match the batch operator") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // k1 survives, k2 evicted, k3 evicted then resurrected, k4 remove
    // arriving before its add must not suppress it
    val data = Seq(
      Ev(1, 1, 1.0, "add"), Ev(1, 2, 2.0, "add"),
      Ev(2, 1, 1.0, "add"), Ev(2, 2, 0.0, "remove"),
      Ev(3, 1, 1.0, "add"), Ev(3, 2, 0.0, "remove"), Ev(3, 3, 3.0, "add"),
      Ev(4, 1, 0.0, "remove"), Ev(4, 2, 4.0, "add"))
    val batch = graft.operators.join.Joins.collectUpsert(
      data.toDF(), Seq("user_id"), "seq",
      add = col("event_type") === "add",
      remove = col("event_type") === "remove")
      .select("user_id", "seq").as[(Long, Long)].collect().toSet
    assert(batch == Set((1L, 2L), (3L, 3L), (4L, 2L)))
    val emitted = runStream("cups")(in =>
      Streaming.collectLatest[Long, Ev](in.toDS(), _.user_id,
        add = _.event_type == "add", remove = _.event_type == "remove"))(data)
      .as[Ev].collect()
    // the batch result == the stream's LAST emission per surviving key
    val lastPerKey = emitted.groupBy(_.user_id)
      .map { case (k, vs) => (k, vs.map(_.seq).max) }.toSet
    assert(lastPerKey.filter(kv => batch.exists(_._1 == kv._1)) == batch)
    // evicted key 2 was emitted while live but is absent from the batch
    assert(emitted.exists(_.user_id == 2L) && !batch.exists(_._1 == 2L))
  }

  test("combine: streaming enrich-latest matches the batch as-of operator") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 'v' rows fill the side buffer, 'c' rows trigger; ts = seq*1000.
    // Key 1 exercises cold-drop, buffer advance, and a shared buffer row;
    // key 2 the equal-ts tie (side lands first); key 3 stays cold.
    val data = Seq(
      Ev(1, 1, 10.0, "c"),
      Ev(1, 2, 1.0, "v"),
      Ev(1, 3, 30.0, "c"),
      Ev(1, 5, 2.0, "v"),
      Ev(1, 6, 60.0, "c"), Ev(1, 7, 70.0, "c"),
      Ev(2, 1, 9.0, "v"), Ev(2, 1, 11.0, "c"),
      Ev(3, 4, 40.0, "c"))
    val df = data.toDF().withColumn("ts_ms", col("seq") * 1000L)
    val left = df.filter(col("event_type") === "c")
    val right = df.filter(col("event_type") === "v")
      .select(col("user_id"), col("ts_ms"), col("value").as("side_value"))
    val batch = graft.operators.join.Joins.asOfLatest(left, right,
        Seq("user_id"), "ts_ms", "ts_ms", Seq("side_value"), "r_")
      .filter(col("r_ts_ms").isNotNull) // the combine cold-buffer rule
      .select("user_id", "seq", "r_side_value")
      .as[(Long, Long, Double)].collect().toSet
    assert(batch == Set((1L, 3L, 1.0), (1L, 6L, 2.0), (1L, 7L, 2.0),
      (2L, 1L, 9.0)))
    val streamed = runStream("cmb")(in =>
      Streaming.enrichLatest[Long, Ev](in.toDS(), _.user_id,
          isTrigger = _.event_type == "c", tsFn = _.seq * 1000L)
        .map { case (t, s) => (t.user_id, t.seq, s.value) })(data)
      .as[(Long, Long, Double)].collect().toSet
    assert(streamed == batch)
  }

  test("state_sequence: streaming rows match the batch operator") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // ts = seq*1000; steps a→b→c with 1500 ms per-step timeouts
    val data = Seq(
      Ev(1, 1, 1.0, "a"), Ev(1, 2, 2.0, "b"), Ev(1, 3, 3.0, "c"), // hit
      Ev(1, 4, 4.0, "a"), Ev(1, 6, 5.0, "c"),                     // broken
      Ev(1, 7, 6.0, "a"), Ev(1, 10, 7.0, "b"), Ev(1, 11, 8.0, "c"), // gap
      Ev(2, 1, 1.0, "a"), Ev(2, 2, 2.0, "b"), Ev(2, 3, 3.0, "c")) // hit
    val df = data.toDF().withColumn("ts_ms", col("seq") * 1000L)
    val batch = graft.operators.state.StateOps.stateSequence(df,
      preds = Seq(col("event_type") === "a", col("event_type") === "b",
        col("event_type") === "c"),
      timeoutsMs = Seq(1500L, 1500L), tsMs = col("ts_ms"),
      keys = Seq(col("user_id")), order = Seq(col("seq")))
      .select("user_id", "seq").as[(Long, Long)].collect().toSet
    assert(batch == Set((1L, 3L), (2L, 3L)))
    val streamed = runStream("sseq")(in =>
      Streaming.stateSequence[Long, Ev](in.toDS(), _.user_id,
        preds = Seq(_.event_type == "a", _.event_type == "b",
          _.event_type == "c"),
        timeoutsMs = Seq(1500L, 1500L), tsFn = _.seq * 1000L))(data)
      .as[Ev].collect().map(e => (e.user_id, e.seq)).toSet
    assert(streamed == batch)
  }

  test("win_time tumbling: streaming emissions match the batch aggregate") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val data = for { u <- 1L to 2L; i <- 0L until 12L }
      yield Ev(u, i, i * 1.0 + u, "a")
    def withTs(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("ts", timestamp_millis(col("seq") * 1000L))
    def windowed(df: org.apache.spark.sql.DataFrame) =
      graft.operators.window.Windows.tumblingAgg(
        df, col("ts"), "5 seconds", Seq(col("user_id")),
        Seq(count(col("value")).as("n"), max(col("value")).as("vmax")))
    val batch = windowed(withTs(data.toDF()))
      .select("user_id", "window_start_ms", "n", "vmax")
      .as[(Long, Long, Long, Double)].collect().toSet
    // append mode only emits windows the watermark has passed: a far-future
    // sentinel closes every real window; its own (still-open) window is the
    // one row the stream may not emit
    val sentinel = Ev(1L, 1000000L, 0.0, "wm")
    val streamed = runStream("wtt")(in =>
      windowed(withTs(in.toDF()).withWatermark("ts", "0 seconds"))
        .select("user_id", "window_start_ms", "n", "vmax"))(
      data :+ sentinel)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(streamed == batch)
  }

  test("win_session: streaming session merges match the batch aggregate") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // per-user bursts with >2s silences between them: u1 sessions
    // {0,1,2}, {6,7}, {12}; u2 sessions {0}, {5,6}
    val seqs = Map(1L -> Seq(0L, 1L, 2L, 6L, 7L, 12L),
      2L -> Seq(0L, 5L, 6L))
    val data = for { (u, ss) <- seqs.toSeq; i <- ss }
      yield Ev(u, i, i.toDouble, "a")
    def withTs(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("ts", timestamp_millis(col("seq") * 1000L))
    def windowed(df: org.apache.spark.sql.DataFrame) =
      graft.operators.window.Windows.sessionAgg(
        df, col("ts"), "2 seconds", Seq(col("user_id")),
        Seq(count(col("value")).as("n"), max(col("value")).as("vmax")))
    val batch = windowed(withTs(data.toDF()))
      .select("user_id", "session_start_ms", "session_end_ms", "n")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(batch.size == 5) // the fixture really exercises merging
    val sentinel = Ev(1L, 1000000L, 0.0, "wm")
    val streamed = runStream("wse")(in =>
      windowed(withTs(in.toDF()).withWatermark("ts", "0 seconds"))
        .select("user_id", "session_start_ms", "session_end_ms", "n"))(
      data :+ sentinel)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(streamed == batch)
  }

  // deadman's heartbeat is processing-time-timer driven; in a memory-stream
  // test processAllAvailable never settles while timers re-arm, so the
  // pass-through contract is asserted in batch execution instead.
  test("deadman forwards traffic (heartbeat is timer-driven)") {
    import spark.implicits._
    val ds = Seq(Ev(1, 1, 1.0, "a"), Ev(2, 2, 2.0, "b")).toDS()
    val out = Streaming.deadman[Long, Ev](ds, _.user_id, 60000L,
      k => Ev(k, -1, 0.0, "heartbeat")).collect()
    assert(out.count(_.event_type != "heartbeat") == 2)
  }

  test("hash_sample: per-row gate streams as-is, emissions match batch") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // stateless Column filter — the streaming form IS the batch form
    val data = (1L to 50L).map(i => Ev(i, i, i.toDouble, "d"))
    val batch = graft.operators.text.TextOps.hashSample(
      data.toDF(), col("seq"), lit(0.4))
      .select("seq").as[Long].collect().toSet
    assert(batch.nonEmpty && batch.size < 50) // the gate actually gates
    val streamed = runStream("hsamp")(in =>
      graft.operators.text.TextOps.hashSample(
        in.toDS().toDF(), col("seq"), lit(0.4)).as[Ev])(data)
      .select("seq").as[Long].collect().toSet
    assert(streamed == batch)
  }

  test("pack_bins: streaming cursor state matches the batch window arithmetic") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // two shards (user_id), token counts in `value`, order by seq; bins
    // of 8 tokens: doc 2 in shard 1 straddles windows (n_bins 2)
    val data = Seq(
      Ev(1, 1, 5.0, "d"), Ev(1, 2, 6.0, "d"), Ev(1, 3, 2.0, "d"),
      Ev(1, 4, 17.0, "d"), // spans 3 windows
      Ev(2, 1, 8.0, "d"), Ev(2, 2, 1.0, "d"))
    val batch = graft.operators.text.TextOps.packBins(
      data.toDF(), col("value").cast("long"), col("user_id"),
      Seq(col("seq")), binTokens = 8)
      .select("user_id", "seq", "bin_id", "bin_offset", "n_bins")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val streamed = runStream("pbins")(in =>
      Streaming.packBins[Long, Ev](in.toDS(), _.user_id,
        _.value.toLong, _.seq, binTokens = 8)
        .map { case (v, binId, off, n) => (v.user_id, v.seq, binId, off, n) })(
      data)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(streamed == batch)
    // split across TWO micro-batches (ordered per shard): state carries
    // the cursor, emissions still match batch end-to-end
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in2 = MemoryStream[Ev]
    val q = Streaming.packBins[Long, Ev](in2.toDS(), _.user_id,
      _.value.toLong, _.seq, binTokens = 8)
      .map { case (v, binId, off, n) => (v.user_id, v.seq, binId, off, n) }
      .writeStream.format("memory").queryName("pbins2")
      .outputMode("append").start()
    in2.addData(data.take(3)); q.processAllAvailable()
    in2.addData(data.drop(3)); q.processAllAvailable()
    q.stop()
    val twoBatches = spark.table("pbins2")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(twoBatches == batch)
  }

  test("repetition/gopher/pii per-row ops stream as-is, match batch") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val T = graft.operators.text.TextOps
    // event_type carries the text; repeated words exercise the run fold
    val data = Seq(
      Ev(1, 1, 0, "a b a b a b a b"),
      Ev(1, 2, 0, "the a of and to is in x y z"),
      Ev(1, 3, 0, "mail me bob@x.example or 10.0.0.1"))
    def metrics(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("_t", T.tokens(col("event_type")))
      .withColumn("_g", T.shinglesFromTokens(col("_t"), 2,
        distinct = false))
      .withColumn("_rs", T.runStats(col("_g")))
      .select(col("seq"),
        col("_rs").getField("top").as("top"),
        col("_rs").getField("dup").as("dup"),
        T.gopherReason(size(col("_t")), T.charCount(col("event_type")),
          T.langScoreFromTokens(col("_t"), "en"),
          col("_rs").getField("top") * lit(1.0) /
            greatest(size(col("_g")), lit(1))).as("reason"),
        T.piiScrub(col("event_type")).as("scrubbed"))
    val batch = metrics(data.toDF()).collect().map(_.toSeq).toSet
    val streamed = runStream("perrow")(in =>
      metrics(in.toDS().toDF()).as[(Long, Long, Long, String, String)])(
      data).collect().map(_.toSeq).toSet
    assert(streamed == batch)
    // the scrub actually fired
    assert(batch.exists(_.last.toString.contains("<EMAIL>")))
  }

  test("mixture gate: stream gated by static rates matches batch") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val T = graft.operators.text.TextOps
    val data = (1L to 60L).map(i =>
      Ev(i % 3, i, i.toDouble, if (i % 3 == 0) "en" else "de"))
    val static = data.toDF()
    val w = when(col("event_type") === "en", lit(4)).otherwise(lit(1))
    val batch = T.sampleToMixture(static, col("seq"), col("event_type"), w)
      .select("seq").as[Long].collect().toSet
    assert(batch.nonEmpty && batch.size < 60)
    // production shape: rates are a batch fact over the static corpus,
    // the arriving stream pays only the broadcast join + row gate
    val rates = T.mixtureRates(static, col("event_type"), w)
    val streamed = runStream("mixgate")(in =>
      T.applyMixtureGate(in.toDS().toDF(), col("seq"), col("event_type"),
        rates).as[Ev])(data)
      .select("seq").as[Long].collect().toSet
    assert(streamed == batch)
  }

  test("near-dup pairs: micro-batch form via foreachBatch matches batch") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // LSH near-dup is corpus-relative, so the streaming form is scoped
    // per micro-batch (foreachBatch) — pairs WITHIN a batch; corpus-wide
    // dedup stays a batch job (docs/SCALE.md). One-batch drain == batch.
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again!"),
      (3L, "completely different text about spark structured streaming"))
    val batch = graft.operators.text.Dedup.nearDupPairs(
      docs.toDF("doc_id", "body"), col("body"), col("doc_id"),
      threshold = 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(batch == Set((1L, 2L)))
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.Set.empty[(Long, Long)]
    val q = in.toDS().toDF("doc_id", "body").writeStream
      .foreachBatch { (mb: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= graft.operators.text.Dedup.nearDupPairs(mb, col("body"),
            col("doc_id"), threshold = 0.5)
          .select("a", "b").as[(Long, Long)].collect()
        ()
      }.start()
    in.addData(docs)
    q.processAllAvailable()
    q.stop()
    assert(got.toSet == batch)
  }

  test("near-dup vs static index: stream probe matches batch") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val D = graft.operators.text.Dedup
    // established corpus -> static index; docs 101/103 arrive later and
    // probe it (101 near-dups corpus doc 1, 103 matches nothing)
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "completely different text about spark structured streaming"),
      (3L, "a third unrelated document mentioning hash joins and sorts"))
    val arriving = Seq(
      (101L, "the quick brown fox jumps over the lazy dog again and again!"),
      (103L, "nothing like anything in the established corpus at all ok"))
    val idx = D.nearDupIndex(corpus.toDF("doc_id", "body"),
      col("body"), col("doc_id"))
    def probe(df: org.apache.spark.sql.DataFrame) =
      D.nearDupVsIndex(df, col("body"), col("doc_id"), idx, 0.5)
    val batch = probe(arriving.toDF("doc_id", "body"))
      .as[(Long, Long, Double)].collect().toSet
    assert(batch.map(p => (p._1, p._2)) == Set((101L, 1L)))
    // the probe is a stream-static join + stateful pair dedup — the SAME
    // code runs on the stream, split across two micro-batches
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = probe(in.toDS().toDF("doc_id", "body")).writeStream
      .format("memory").queryName("vsidx").outputMode("append").start()
    in.addData(arriving.take(1))
    q.processAllAvailable()
    in.addData(arriving.drop(1))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("vsidx")
      .as[(Long, Long, Double)].collect().toSet
    assert(streamed == batch)
  }

  test("perplexity + dsir: stream scored against static facts matches batch") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val T = graft.operators.text.TextOps
    // static corpus trains the LM and the DSIR tables; the stream is
    // held-out docs. Scoring = stateless explode + stream-static joins
    // + a per-doc aggregate, so the streaming form runs in complete mode
    val corpus = Seq(
      (1L, "the quick brown fox", true), (2L, "the quick red fox", true),
      (3L, "ein schneller brauner fuchs", false),
      (4L, "ein roter fuchs springt", false)).toDF("doc_id", "body", "tgt")
    val arriving = Seq((10L, "the quick fox"), (11L, "ein brauner fuchs"))
    val lm = T.bigramLm(corpus, col("body"))
    val (tab, tot) = T.dsirTables(corpus, col("body"), col("tgt"))
    def ppl(df: org.apache.spark.sql.DataFrame) =
      T.perplexityFromPairs(
        T.bigramPairs(df, col("body"), col("doc_id")), lm)
    def dsir(df: org.apache.spark.sql.DataFrame) =
      T.dsirScoreWith(df, col("body"), col("doc_id"), tab, tot)
    val static = arriving.toDF("doc_id", "body")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def streamed(name: String)(
        f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame) = {
      val in = MemoryStream[(Long, String)]
      val q = f(in.toDS().toDF("doc_id", "body")).writeStream
        .format("memory").queryName(name).outputMode("complete").start()
      in.addData(arriving)
      q.processAllAvailable()
      q.stop()
      spark.table(name).collect().map(_.toSeq).toSet
    }
    val batchPpl = ppl(static).collect().map(_.toSeq).toSet
    assert(batchPpl.size == 2)
    assert(streamed("pplstream")(ppl) == batchPpl)
    val batchDsir = dsir(static).collect().map(_.toSeq).toSet
    assert(batchDsir.size == 2)
    assert(streamed("dsirstream")(dsir) == batchDsir)
  }

  test("chunk + centroids: per-row chunking streams as-is; the label-" +
      "centroid aggregate streams in complete mode — both match batch") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val T = graft.operators.text.TextOps
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // chunking is a pure generator — append-mode streaming, row for row
    val docs = Seq((1L, (1 to 10).map("t" + _).mkString(" ")),
      (2L, "a b c"))
    def chunks(df: org.apache.spark.sql.DataFrame) =
      T.chunkTokens(df, col("body"), col("doc_id"), 4, 3)
    val batchChunks = chunks(docs.toDF("doc_id", "body"))
      .collect().map(_.toSeq).toSet
    val inC = MemoryStream[(Long, String)]
    val qc = chunks(inC.toDS().toDF("doc_id", "body")).writeStream
      .format("memory").queryName("chunkstream")
      .outputMode("append").start()
    inC.addData(docs)
    qc.processAllAvailable(); qc.stop()
    assert(spark.table("chunkstream").collect().map(_.toSeq).toSet
      == batchChunks)
    assert(batchChunks.nonEmpty)
    // label centroids: a grouped aggregate with ASSOCIATIVE fixed-point
    // state — complete-mode streaming gives the batch answer exactly
    // (the float-sum form could not promise this; the fixed-point
    // design is what makes the streaming twin exact)
    val vecs = Seq((1L, Array(0.5f, -0.25f), 1),
      (2L, Array(0.25f, 0.75f), 1), (3L, Array(-1f, 0.125f), 2))
    def cents(df: org.apache.spark.sql.DataFrame) =
      graft.operators.vector.VectorCuration.labelCentroids(
        df, "embedding", "label")
    val batchCents = cents(vecs.toDF("vec_id", "embedding", "label"))
      .collect().map(_.toSeq).toSet
    val inV = MemoryStream[(Long, Array[Float], Int)]
    val qv = cents(inV.toDS().toDF("vec_id", "embedding", "label"))
      .writeStream.format("memory").queryName("centstream")
      .outputMode("complete").start()
    inV.addData(vecs)
    qv.processAllAvailable(); qv.stop()
    assert(spark.table("centstream").collect().map(_.toSeq).toSet
      == batchCents)
    assert(batchCents.size == 4) // 2 labels × 2 dims
  }

  test("slidingSeries: last emission per key equals batch keySeries") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val S = graft.operators.series.Series
    val m = 8
    // per-key ordered arrival (seq doubles as ts and unique tiebreak)
    val data = (1L to 30L).map(i => Ev(i % 3, i, (i * 7 % 11).toDouble, "x"))
    val batch = S.keySeries(data.toDF(), col("user_id"),
      Seq(col("seq")), col("value"), m)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toList).toMap
    assert(batch.size == 3)
    // stream split across two micro-batches; the ring emits after each
    // full window — keep the LAST emission per key
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = Streaming.slidingSeries[Long, Ev](in.toDS(), _.user_id,
        _.value, m)
      .toDF("key", "series")
      .writeStream.format("memory").queryName("ringseries")
      .outputMode("append").start()
    in.addData(data.take(17))
    q.processAllAvailable()
    in.addData(data.drop(17))
    q.processAllAvailable()
    q.stop()
    // emissions arrive in order per key within the sink table; take the
    // last per key via a monotone emission index
    val emitted = spark.table("ringseries").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toList)
    val last = emitted.zipWithIndex.groupBy(_._1._1)
      .map { case (k, rs) => k -> rs.maxBy(_._2)._1._2 }
    assert(last == batch)
  }

  test("bm25: stream scored against static corpus stats matches batch") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val T = graft.operators.text.TextOps
    val data = (1L to 40L).map(i => Ev(i % 4, i, i.toDouble, "x"))
    def withText(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("text", concat_ws(" ",
        when(col("seq") % 2 === 0, lit("spark")).otherwise(lit("flink")),
        when(col("seq") % 3 === 0, lit("hash")).otherwise(lit("sort")),
        lit("data")))
    val static = withText(data.toDF())
    val terms = Seq("spark", "hash")
    // production shape: the index (corpus stats) is a batch fact; the
    // arriving stream pays per-row tf expressions + a broadcast join.
    // The top-k CUT stays batch-side by design (ill-defined unbounded).
    val stats = T.bm25Stats(static, col("text"), terms)
    val batch = T.bm25ScoreWith(static, col("text"), col("seq"), terms,
      stats).select("doc_id", "score").as[(Long, Double)].collect().toSet
    assert(batch.exists(_._2 > 0) && batch.exists(_._2 == 0.0))
    val streamed = runStream("bm25s")(in =>
      T.bm25ScoreWith(withText(in.toDS().toDF()), col("text"), col("seq"),
        terms, stats))(data)
      .select("doc_id", "score").as[(Long, Double)].collect().toSet
    assert(streamed == batch)
  }

  test("split_assign: per-row gate streams as-is, emissions match batch") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val C = graft.operators.text.Curation
    val data = (1L to 50L).map(i => Ev(i % 3, i, i.toDouble, "x"))
    val splits = Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))
    val batch = C.splitAssign(data.toDF(), col("seq"), splits)
      .select("seq", "split").as[(Long, String)].collect().toSet
    val got = runStream("splitassign")(in =>
      C.splitAssign(in.toDS().toDF(), col("seq"), splits)
        .selectExpr("seq", "split")
        .as[(Long, String)])(data)
      .as[(Long, String)].collect().toSet
    assert(got == batch)
  }

  test("normalize: per-row op streams as-is, emissions match batch") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val T = graft.operators.text.TextOps
    val data = (1L to 30L).map(i => Ev(i % 3, i, i.toDouble, s"A B!  c$i"))
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select(col("seq"),
        T.normalize(col("event_type"), lower = true, stripPunct = true)
          .as("n"))
    val batch = norm(data.toDF()).as[(Long, String)].collect().toSet
    assert(batch.exists(_._2.startsWith("a b c")))
    val streamed = runStream("normstream")(in =>
      norm(in.toDS().toDF()).as[(Long, String)])(data)
      .as[(Long, String)].collect().toSet
    assert(streamed == batch)
  }

  test("temperature mixture: stream gated by static rates matches batch") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val T = graft.operators.text.TextOps
    // skewed strata so alpha = 0.5 actually downsamples the majority
    val data = (1L to 80L).map(i =>
      Ev(i % 3, i, i.toDouble, if (i % 4 == 0) "de" else "en"))
    val static = data.toDF()
    val batch = T.sampleToMixtureTemp(static, col("seq"),
        col("event_type"), 0.5)
      .select("seq").as[Long].collect().toSet
    assert(batch.nonEmpty && batch.size < 80)
    // production shape: the n^alpha rates are a batch fact over the
    // static corpus; the stream pays the broadcast join + row gate
    val rates = T.mixtureRatesTemp(static, col("event_type"), 0.5)
    val streamed = runStream("mixtemp")(in =>
      T.applyMixtureGate(in.toDS().toDF(), col("seq"), col("event_type"),
        rates).as[Ev])(data)
      .select("seq").as[Long].collect().toSet
    assert(streamed == batch)
  }

  test("fuzzy decontamination: micro-batch form via foreachBatch " +
    "matches batch") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val D = graft.operators.text.Dedup
    // the benchmark is a static fact; arriving docs are checked per
    // micro-batch against it (per-doc rollup is an aggregate, so the
    // streaming form is foreachBatch over bench ∪ micro-batch — the
    // near-dup-pairs convention; the underlying stream-static probe is
    // pinned by "near-dup vs static index" above)
    val bench = Seq(
      (1L, true, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, true, "completely different text about spark structured streaming"))
    val arriving = Seq(
      (101L, false, "the quick brown fox jumps over the lazy dog again and again!"),
      (103L, false, "nothing like anything in the established corpus at all ok"))
    def decon(df: org.apache.spark.sql.DataFrame) =
      D.decontaminateFuzzy(df, col("body"), col("doc_id"), col("bm"), 0.5)
    val batch = decon((bench ++ arriving).toDF("doc_id", "bm", "body"))
      .select("doc_id", "contaminated").as[(Long, Boolean)]
      .collect().toSet
    assert(batch == Set((101L, true), (103L, false)))
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Boolean, String)]
    val got = scala.collection.mutable.Set.empty[(Long, Boolean)]
    val benchDf = bench.toDF("doc_id", "bm", "body")
    val q = in.toDS().toDF("doc_id", "bm", "body").writeStream
      .foreachBatch { (mb: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= decon(benchDf.unionByName(mb))
          .select("doc_id", "contaminated").as[(Long, Boolean)].collect()
        ()
      }.start()
    in.addData(arriving.take(1))
    q.processAllAvailable()
    in.addData(arriving.drop(1))
    q.processAllAvailable()
    q.stop()
    assert(got.toSet == batch)
  }

  test("c4Filter: per-row line rules stream as-is, emissions match batch") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val data = (1L to 20L).map { i =>
      val txt = if (i % 3 == 0) "keep this longer line.\nshort.\nno punct here"
      else "good first line stays here.\nsecond good line also stays!"
      Ev(i % 3, i, i.toDouble, txt)
    }
    def c4(df: org.apache.spark.sql.DataFrame) =
      graft.operators.text.TextOps.c4Filter(df, col("event_type"),
        minWords = 3, lineBlock = Seq("javascript"), docBlock = Seq("{"),
        minLines = 1)
        .select(col("seq"), col("clean_text"), col("n_kept"))
    val batch = c4(data.toDF()).as[(Long, String, Int)].collect().toSet
    assert(batch.nonEmpty)
    val streamed = runStream("c4stream")(in =>
      c4(in.toDS().toDF()).as[(Long, String, Int)])(data)
      .as[(Long, String, Int)].collect().toSet
    assert(streamed == batch)
  }

  test("count-min candidate gate: stream probed against a static " +
      "corpus's sketch matches batch") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val S = graft.operators.text.Sketches
    val corpus = (1L to 40L).map(i =>
      Ev(1, i, i.toDouble, if (i % 4 == 0) "rare word" else "hot hot hot"))
    val static = corpus.toDF()
    // the sketch is a batch fact of the established corpus
    val sk = S.countMin(static, col("event_type"), 3, 8).localCheckpoint()
    def gate(df: org.apache.spark.sql.DataFrame) =
      S.cmCandidates(df, sk, col("event_type"), 30L, 3, 8)
    val batch = gate(static).as[(String, Long)].collect()
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(batch.keys.map(_._1).toSet == Set("hot")) // 90 occurrences
    val streamed = runStream("cmstream")(in =>
      gate(in.toDS().toDF()).as[(String, Long)])(corpus)
      .as[(String, Long)].collect()
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(streamed == batch)
  }

  test("upsample repeat: stream gated by static rates matches batch, " +
      "copies included") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val T = graft.operators.text.TextOps
    val data = (1L to 60L).map(i =>
      Ev(i % 3, i, i.toDouble, if (i % 5 == 0) "de" else "en"))
    val static = data.toDF()
    val rates = T.upsampleRates(static, col("event_type"),
      when(col("event_type") === "de", 4.0).otherwise(1.0), 1.5)
      .localCheckpoint()
    def up(df: org.apache.spark.sql.DataFrame) =
      T.applyUpsampleRepeat(df, col("seq"), col("event_type"), rates)
        .select(col("seq"), col("copy"))
    val batch = up(static).as[(Long, Long)].collect().toSet
    assert(batch.exists(_._2 >= 1)) // some row actually repeats
    val streamed = runStream("upstream")(in =>
      up(in.toDS().toDF()).as[(Long, Long)])(data)
      .as[(Long, Long)].collect().toSet
    assert(streamed == batch)
  }

  test("urlCanon + domainBlocklist: per-row ops stream as-is, " +
      "emissions match batch") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val C = graft.operators.text.Curation
    val data = (1L to 20L).map(i => Ev(i % 3, i,
      i.toDouble, s"https://WWW.h$i.spam.example:443/p/$i/?utm_s=1&a=$i"))
    def f(df: org.apache.spark.sql.DataFrame) =
      C.domainBlocklist(
        df.select(col("seq"), C.urlCanon(col("event_type")).as("canon")),
        regexp_extract(col("canon"), "^https?://([^/:]*)", 1),
        Seq("spam.example"), annotate = true)
        .select(col("seq"), col("canon"), col("blocked"))
    val batch = f(data.toDF()).as[(Long, String, Boolean)].collect().toSet
    assert(batch.forall(_._3) && batch.exists(
      _._2.startsWith("https://h1.spam.example/p/1?a=1")))
    val streamed = runStream("urlcanonstream")(in =>
      f(in.toDS().toDF()).as[(Long, String, Boolean)])(data)
      .as[(Long, String, Boolean)].collect().toSet
    assert(streamed == batch)
  }

  test("naiveBayesClassify: micro-batch scoring against the static " +
      "trained model matches batch") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val C = graft.operators.text.Curation
    // the model is train-side static; scoring is per-doc pure given the
    // model, so foreachBatch micro-batch scoring == batch exactly even
    // with docs split across batches (docs/SCALE.md operator map)
    val train = Seq(
      (1L, "buy pills now cheap", "spam"),
      (2L, "cheap pills buy pills", "spam"),
      (3L, "meeting at noon today", "ham"),
      (4L, "lunch meeting today plan", "ham")).toDF("id", "body", "cls")
    val arriving = Seq((10L, "buy cheap pills"), (11L, "noon meeting"),
      (12L, "pills at noon"))
    def score(df: org.apache.spark.sql.DataFrame) =
      C.naiveBayesClassify(train, df, col("body"), col("id"), col("cls"))
        .select("doc_id", "pred", "score_nano")
    val batch = score(arriving.toDF("id", "body"))
      .as[(Long, String, Long)].collect().toSet
    // doc 12 is a tie (spam matches ln4, ham ln2+ln2) that FixedLog
    // makes EXACT: lnNano(4) = 2·lnNano(2) identically (both are
    // p·Ln2Nano with t1 = 0), priors and bases are symmetric, so the
    // deterministic (score, class) tie-break picks the
    // lexicographically larger class — spam — on any engine
    assert(batch.map(t => t._1 -> t._2).toMap ==
      Map(10L -> "spam", 11L -> "ham", 12L -> "spam"))
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.Set.empty[(Long, String, Long)]
    val q = in.toDS().toDF("id", "body").writeStream
      .foreachBatch { (mb: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= score(mb).as[(Long, String, Long)].collect()
        ()
      }.start()
    in.addData(arriving.take(1))
    in.addData(arriving.drop(1))
    q.processAllAvailable()
    q.stop()
    assert(got.toSet == batch)
  }

  test("sentenceSplit streams as-is; spanDedup + editDupPairs run " +
      "per micro-batch (corpus-relative, the near-dup scoping)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val T = graft.operators.text.TextOps
    val data = (1L to 12L).map(i => Ev(i % 3, i, i.toDouble,
      s"First bit $i. Second bit $i! Third ${i % 2}?"))
    def split(df: org.apache.spark.sql.DataFrame) =
      T.sentenceSplit(df, col("event_type"), col("seq"))
    val batch = split(data.toDF())
      .as[(Long, Int, String)].collect().toSet
    assert(batch.size == 36)
    val streamed = runStream("sentsplitstream")(in =>
      split(in.toDS().toDF()).as[(Long, Int, String)])(data)
      .as[(Long, Int, String)].collect().toSet
    assert(streamed == batch)
    // spanDedup is corpus-relative — the streaming form is per
    // micro-batch (foreachBatch), same scoping as near-dup pairs;
    // one-batch drain == batch exactly
    val docs = Seq(
      (1L, "A same. B same. C same. Tail one."),
      (2L, "A same. B same. C same. Tail two."))
    val sdBatch = T.spanDedup(docs.toDF("doc_id", "body"), col("body"),
      col("doc_id"), 3).as[(Long, Int, Int, String)].collect().toSet
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.Set.empty[(Long, Int, Int, String)]
    val q = in.toDS().toDF("doc_id", "body").writeStream
      .foreachBatch { (mb: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= T.spanDedup(mb, col("body"), col("doc_id"), 3)
          .as[(Long, Int, Int, String)].collect()
        ()
      }.start()
    in.addData(docs)
    q.processAllAvailable()
    q.stop()
    assert(got.toSet == sdBatch &&
      sdBatch.exists(t => t._1 == 2L && t._3 == 3))
  }

  test("groupZScore runs per micro-batch with BATCH-scoped group stats " +
      "(corpus-relative, the span_dedup scoping); quantileBuckets is " +
      "batch-only by nature (GlobalOrder needs the corpus)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val C = graft.operators.text.Curation
    val rows = Seq(
      ("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 3L, 3.0), ("a", 4L, 100.0),
      ("b", 5L, 5.0), ("b", 6L, 5.0), ("b", 7L, 5.0))
    def z(df: org.apache.spark.sql.DataFrame) =
      C.groupZScore(df, col("g"), col("x"))
        .select("id", "z_nano", "is_outlier")
    val batch = z(rows.toDF("g", "id", "x"))
      .as[(Long, Long, Boolean)].collect().toSet
    // constant group b → var 0 → z 0; group a's 100.0 dominates
    assert(batch.count(_._2 == 0L) >= 3)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(String, Long, Double)]
    val got = scala.collection.mutable.Set.empty[(Long, Long, Boolean)]
    val q = in.toDS().toDF("g", "id", "x").writeStream
      .foreachBatch { (mb: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= z(mb).as[(Long, Long, Boolean)].collect()
        ()
      }.start()
    // one-batch drain == batch exactly; a SPLIT drain would rescope
    // the stats per batch (documented corpus-relative divergence, the
    // same rule span_dedup carries)
    in.addData(rows)
    q.processAllAvailable()
    q.stop()
    assert(got.toSet == batch)
    // and the split-scope claim itself, pinned: stats re-derive per
    // batch, so each half equals its own batch-mode replay
    val (h1, h2) = rows.splitAt(4)
    val perBatch = z(h1.toDF("g", "id", "x"))
      .as[(Long, Long, Boolean)].collect().toSet ++
      z(h2.toDF("g", "id", "x"))
        .as[(Long, Long, Boolean)].collect().toSet
    val got2 = scala.collection.mutable.Set.empty[(Long, Long, Boolean)]
    val in2 = MemoryStream[(String, Long, Double)]
    val q2 = in2.toDS().toDF("g", "id", "x").writeStream
      .foreachBatch { (mb: org.apache.spark.sql.DataFrame, _: Long) =>
        got2 ++= z(mb).as[(Long, Long, Boolean)].collect()
        ()
      }.start()
    in2.addData(h1)
    q2.processAllAvailable()
    in2.addData(h2)
    q2.processAllAvailable()
    q2.stop()
    assert(got2.toSet == perBatch)
    // quantileBuckets: an exact corpus ntile needs the corpus — the
    // unsupported-by-construction check (GlobalOrder's zipWithIndex
    // cannot run on a streaming frame)
    val ex = intercept[Exception] {
      val in3 = MemoryStream[(String, Long, Double)]
      C.quantileBuckets(in3.toDS().toDF("g", "id", "x"),
        col("x"), col("id"), 3).writeStream
        .format("memory").queryName("qbstream").start()
        .processAllAvailable()
    }
    assert(ex != null)
  }

  test("hllRegisters streams as a complete-mode max-aggregate matching " +
      "batch; spanTrim runs per micro-batch with BATCH-scoped keeper " +
      "stats (corpus-relative, the span_dedup scoping)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val S = graft.operators.text.Sketches
    val vals = (1 to 200).map(i => s"v_$i")
    val batchReg = S.hllRegisters(vals.toDF("v"), col("v"), Seq.empty, 5)
      .as[(Int, Int)].collect().toSet
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[String]
    val q = S.hllRegisters(in.toDS().toDF("v"), col("v"), Seq.empty, 5)
      .writeStream.outputMode("complete")
      .format("memory").queryName("hllstream").start()
    in.addData(vals.take(97)) // two uneven batches: registers max-merge
    q.processAllAvailable()
    in.addData(vals.drop(97))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("hllstream")
      .as[(Int, Int)].collect().toSet
    assert(streamed == batchReg)
    // spanTrim: keeper + df are corpus facts — per micro-batch the op
    // rescopes to the batch (the span_dedup/groupZScore rule). One-batch
    // drain == batch exactly.
    val docs = Seq(
      (1L, "a b c d e f"), (2L, "a b c d e x"), (3L, "p q"))
    def trim(df: org.apache.spark.sql.DataFrame) =
      graft.operators.text.TextOps.spanTrim(df, col("text"), col("doc_id"))
    val batchTrim = trim(docs.toDF("doc_id", "text"))
      .as[(Long, Int, Int, String)].collect().toSet
    val got = scala.collection.mutable.Set.empty[(Long, Int, Int, String)]
    val in2 = MemoryStream[(Long, String)]
    val q2 = in2.toDS().toDF("doc_id", "text").writeStream
      .foreachBatch { (mb: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= trim(mb).as[(Long, Int, Int, String)].collect()
        ()
      }.start()
    in2.addData(docs)
    q2.processAllAvailable()
    q2.stop()
    assert(got.toSet == batchTrim)
    // corpusJaccardEst is batch-only as written (multi-aggregate
    // crossJoin); the streaming path is the register algebra — each
    // signature component is an associative min, so micro-batch minima
    // fold into the running signature (SCALE.md round-17 note)
  }

  test("histQuantiles and topTokens run per micro-batch with " +
      "BATCH-scoped stats (rank windows are corpus-relative); " +
      "histogram buckets are additive across batches") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val S = graft.operators.text.Sketches
    val rows = (1 to 100).map(i => ("a", (i * 13 % 47) + 1.0))
    def qs(df: org.apache.spark.sql.DataFrame) =
      S.histQuantiles(df, col("x"), Seq("g" -> col("g")), Seq(500, 900))
        .select("g", "p_milli", "n", "est_micro")
    val batch = qs(rows.toDF("g", "x"))
      .as[(String, Int, Long, Long)].collect().toSet
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val got = scala.collection.mutable.Set.empty[(String, Int, Long, Long)]
    val in = MemoryStream[(String, Double)]
    val q = in.toDS().toDF("g", "x").writeStream
      .foreachBatch { (mb: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= qs(mb).as[(String, Int, Long, Long)].collect()
        ()
      }.start()
    in.addData(rows) // one-batch drain == batch exactly
    q.processAllAvailable()
    q.stop()
    assert(got.toSet == batch)
    // the incremental path is bucket ADDITIVITY, not the rank window:
    // per-half bucket counts sum to the whole corpus's buckets, so
    // per-shard histograms answer corpus quantiles without rescans.
    // (Verified through the public API: quantiles from summed-half
    // buckets == whole-corpus quantiles, via union of the halves.)
    val (h1, h2) = rows.splitAt(37)
    val viaUnion = qs(h1.toDF("g", "x").unionByName(h2.toDF("g", "x")))
      .as[(String, Int, Long, Long)].collect().toSet
    assert(viaUnion == batch)
    // topTokens: same batch-scoped rule (rank window over counts)
    val docRows = Seq(("en", "b b a"), ("en", "a c a"))
    val docs = docRows.toDF("lang", "text")
    val batchTop = graft.operators.text.TextOps
      .topTokens(docs, col("text"), col("lang"), "lang", 2)
      .as[(String, String, Long, Int)].collect().toSet
    val gotTop = scala.collection.mutable.Set.empty[(String, String, Long, Int)]
    val in2 = MemoryStream[(String, String)]
    val q2 = in2.toDS().toDF("lang", "text").writeStream
      .foreachBatch { (mb: org.apache.spark.sql.DataFrame, _: Long) =>
        gotTop ++= graft.operators.text.TextOps
          .topTokens(mb, col("text"), col("lang"), "lang", 2)
          .as[(String, String, Long, Int)].collect()
        ()
      }.start()
    in2.addData(docRows)
    q2.processAllAvailable()
    q2.stop()
    assert(gotTop.toSet == batchTop)
  }

  test("invertedIndex: streaming complete-mode aggregate matches batch " +
      "across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val T = graft.operators.text.TextOps
    val docs = Seq((1L, "a b a c a"), (2L, "b b"), (3L, "c a b"))
    def idx(df: org.apache.spark.sql.DataFrame) =
      T.invertedIndex(df, col("body"), col("doc_id"))
    val batch = idx(docs.toDF("doc_id", "body"))
      .as[(String, Long, Long, String)].collect().toSet
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = idx(in.toDS().toDF("doc_id", "body")).writeStream
      .format("memory").queryName("invidx").outputMode("complete").start()
    in.addData(docs.take(2))
    q.processAllAvailable()
    in.addData(docs.drop(2))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("invidx")
      .as[(String, Long, Long, String)].collect().toSet
    assert(streamed == batch && batch.exists(_ == ("a", 1L, 3L, "1,3,5")))
  }

  test("fim streams as-is; spanCorrupt per micro-batch (doc-pure given " +
      "the (id, pos) gates) matches batch") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val T = graft.operators.text.TextOps
    val data = (1L to 10L).map(i => Ev(i % 3, i, i.toDouble,
      s"alpha beta gamma delta epsilon zeta token$i"))
    def fim(df: org.apache.spark.sql.DataFrame) =
      T.fimTransform(df, col("event_type"), col("seq"))
        .select("doc_id", "fim_text")
    val fimBatch = fim(data.toDF()).as[(Long, String)].collect().toSet
    val fimStream = runStream("fimstream")(in =>
      fim(in.toDS().toDF()).as[(Long, String)])(data)
      .as[(Long, String)].collect().toSet
    assert(fimStream == fimBatch)
    // spanCorrupt: the lag/sum windows bar direct streaming, but the
    // result is per-doc pure given the (id, pos) gates — micro-batch
    // scoping reproduces batch exactly even with docs split across
    // batches
    def sc(df: org.apache.spark.sql.DataFrame) =
      T.spanCorrupt(df, col("body"), col("doc_id"), 300000, 2)
        .select("doc_id", "input_text", "target_text")
    val docs = (1L to 6L).map(i => (i, s"one two three four five six$i"))
    val scBatch = sc(docs.toDF("doc_id", "body"))
      .as[(Long, String, String)].collect().toSet
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.Set.empty[(Long, String, String)]
    val q = in.toDS().toDF("doc_id", "body").writeStream
      .foreachBatch { (mb: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= sc(mb).as[(Long, String, String)].collect()
        ()
      }.start()
    in.addData(docs.take(2))
    in.addData(docs.drop(2))
    q.processAllAvailable()
    q.stop()
    assert(got.toSet == scBatch)
  }

  test("renderChat: streaming complete-mode aggregate matches batch") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val T = graft.operators.text.TextOps
    val data = (1L to 24L).map(i => Ev(i % 4, i, i.toDouble, s"m$i"))
    def render(df: org.apache.spark.sql.DataFrame) =
      T.renderChat(df, col("user_id"), Seq(col("seq")),
        col("event_type"), col("value"))
    val batch = render(data.toDF()).as[(Long, Long, String)]
      .collect().toSet
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = render(in.toDS().toDF()).writeStream.format("memory")
      .queryName("chatstream").outputMode("complete").start()
    in.addData(data.take(10)); q.processAllAvailable()
    in.addData(data.drop(10)); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("chatstream").as[(Long, Long, String)]
      .collect().toSet
    assert(streamed == batch)
  }

  test("wordpiece encode streams as-is (word-local, vocab is a plan " +
      "constant); robustZOutliers runs per micro-batch with " +
      "BATCH-scoped medians (the groupZScore scoping)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // wordpiece: per-word, corpus-independent -> micro-batch == batch
    // on any split (the distinct-word table is a per-batch cache, not
    // state)
    val vocab = Seq("un", "##able", "able", "b", "a", "##a")
    val docs = Seq((0L, "unable able"), (1L, "aaa bun"), (2L, "able"))
    def wp(df: org.apache.spark.sql.DataFrame) =
      graft.operators.text.WordPiece.encode(df, col("text"),
        col("doc_id"), vocab)
    val wpBatch = wp(docs.toDF("doc_id", "text"))
      .as[(Long, Int, Int, String)].collect().toSet
    val in = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.Set.empty[(Long, Int, Int, String)]
    val q = in.toDS().toDF("doc_id", "text").writeStream
      .foreachBatch { (mb: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= wp(mb).as[(Long, Int, Int, String)].collect()
        ()
      }.start()
    in.addData(docs.take(1))
    in.addData(docs.drop(1))
    q.processAllAvailable()
    q.stop()
    assert(got.toSet == wpBatch)
    // robustZOutliers: medians are corpus-relative, so the streaming
    // scope is per micro-batch stats (groupZScore's documented
    // scoping) — one full-batch foreachBatch replay equals batch
    def rz(df: org.apache.spark.sql.DataFrame) =
      graft.operators.text.Sketches.robustZOutliers(df, col("v"),
        col("id"), Seq("g" -> col("g")))
        .select("doc_id", "mad_micro", "outlier")
    val rows = (0L until 30L).map(i => (i, "a", 50.0 + (i % 5))) :+
      ((99L, "a", 4000.0))
    val rzBatch = rz(rows.toDF("id", "g", "v"))
      .as[(Long, Long, Boolean)].collect().toSet
    val in2 = MemoryStream[(Long, String, Double)]
    val got2 = scala.collection.mutable.Set.empty[(Long, Long, Boolean)]
    val q2 = in2.toDS().toDF("id", "g", "v").writeStream
      .foreachBatch { (mb: org.apache.spark.sql.DataFrame, _: Long) =>
        got2 ++= rz(mb).as[(Long, Long, Boolean)].collect()
        ()
      }.start()
    in2.addData(rows)
    q2.processAllAvailable()
    q2.stop()
    assert(got2.toSet == rzBatch && rzBatch.exists(_._3))
    // scope notes for the rest of the round's additions (the
    // corpusJaccardEst convention): pmiTopK / Triangles /
    // nearDupSurvivors are corpus-relative (global pair counts, a
    // whole graph, cluster membership) — batch-only as written; the
    // streaming form is foreachBatch over a bounded refresh window.
    // Fusion.rrfFuse consumes ALREADY-materialized rankings, so its
    // streaming scope is its inputs' (serve-time, not stream-time).
  }

  test("semanticDecon: micro-batch form via foreachBatch against the " +
      "static benchmark matches batch") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dim = 64
    def v(seed: Int, eps: Float = 0f): Seq[Float] =
      Seq.tabulate(dim)(i =>
        (if (i % (seed + 2) == 0) 1f else -0.1f) + (if (i == 0) eps else 0f))
    // benchmark rows are a static fact; arriving corpus rows are scored
    // per micro-batch against them — every output row depends only on
    // (its own vector, the static bench side), so micro-batch == batch
    // exactly (the fuzzy-decontamination convention above)
    val bench = Seq((100L, v(3)), (101L, v(7)))
    val arriving = Seq((1L, v(3, 0.01f)), (2L, v(11)), (3L, v(7, -0.02f)))
    def decon(df: org.apache.spark.sql.DataFrame) =
      graft.operators.vector.VectorOps.semanticDecon(df, "vec_id",
        "embedding", col("vec_id") >= 100L, threshold = 0.9,
        bands = 4, rowsPerBand = 2, dim = dim)
    val batch = decon((bench ++ arriving).toDF("vec_id", "embedding"))
      .select("vec_id", "contaminated").as[(Long, Boolean)].collect().toSet
    assert(batch == Set((1L, true), (2L, false), (3L, true)))
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Seq[Float])]
    val got = scala.collection.mutable.Set.empty[(Long, Boolean)]
    val benchDf = bench.toDF("vec_id", "embedding")
    val q = in.toDS().toDF("vec_id", "embedding").writeStream
      .foreachBatch { (mb: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= decon(benchDf.unionByName(mb))
          .select("vec_id", "contaminated").as[(Long, Boolean)].collect()
        ()
      }.start()
    in.addData(arriving.take(1))
    q.processAllAvailable()
    in.addData(arriving.drop(1))
    q.processAllAvailable()
    q.stop()
    assert(got.toSet == batch)
  }

  test("coreness: foreachBatch snapshot over accumulated edges matches " +
      "batch (the documented batch-only scoping)") {
    import spark.implicits._
    // a corpus fixed point (coreness depends on the WHOLE edge set), so
    // the streaming form is the SCALE.md snapshot convention: per
    // micro-batch, recompute over everything seen so far; the final
    // snapshot must equal the one-shot batch answer
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L))
    def cness(df: org.apache.spark.sql.DataFrame) =
      graft.operators.graph.GraphOps.coreness(df, 8, 8)
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val batch = cness(edges.toDF("a", "b"))
    assert(batch == Set((1L, 3), (2L, 3), (3L, 3), (4L, 3), (5L, 1),
      (6L, 1)))
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Long)]
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var last: Set[(Long, Int)] = Set.empty
    val q = in.toDS().toDF("a", "b").writeStream
      .foreachBatch { (mb: org.apache.spark.sql.DataFrame, _: Long) =>
        seen ++= mb.as[(Long, Long)].collect()
        last = cness(seen.toSeq.toDF("a", "b"))
        ()
      }.start()
    in.addData(edges.take(4))
    q.processAllAvailable()
    // mid-stream snapshot sees only the partial graph (no clique yet)
    assert(last.forall(_._2 <= 2))
    in.addData(edges.drop(4))
    q.processAllAvailable()
    q.stop()
    assert(last == batch)
  }

  test("kCore: foreachBatch snapshot over accumulated edges matches " +
      "batch (the documented batch-only scoping)") {
    import spark.implicits._
    // same corpus-fixed-point scoping as coreness: the k-core depends
    // on the WHOLE edge set (an edge arriving later can revive a
    // previously peeled node), so the streaming form is the SCALE.md
    // snapshot convention — per micro-batch, recompute over everything
    // seen so far; the final snapshot must equal the one-shot batch
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L), (5L, 6L),
      (6L, 4L), (3L, 4L), (6L, 7L))
    def core(df: org.apache.spark.sql.DataFrame) =
      graft.operators.graph.GraphOps.kCore(df, 2, 8)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = core(edges.toDF("a", "b"))
    // both triangles survive at k=2; the pendant 7 peels away
    assert(batch.map(_._1) == Set(1L, 2L, 3L, 4L, 5L, 6L))
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Long)]
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var last: Set[(Long, Long)] = Set.empty
    val q = in.toDS().toDF("a", "b").writeStream
      .foreachBatch { (mb: org.apache.spark.sql.DataFrame, _: Long) =>
        seen ++= mb.as[(Long, Long)].collect()
        last = core(seen.toSeq.toDF("a", "b"))
        ()
      }.start()
    in.addData(edges.take(3))
    q.processAllAvailable()
    // first triangle alone: only its 3 nodes in the 2-core
    assert(last.map(_._1) == Set(1L, 2L, 3L))
    in.addData(edges.drop(3))
    q.processAllAvailable()
    q.stop()
    assert(last == batch)
  }

  test("lpaCommunities: foreachBatch snapshot over accumulated edges " +
      "matches batch (the documented batch-only scoping)") {
    import spark.implicits._
    // LPA labels are a synchronous fixed point over the whole graph —
    // an arriving edge can flip labels arbitrarily far away, so the
    // streaming form is the snapshot convention, not incremental state
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L), (5L, 6L),
      (6L, 4L), (3L, 4L))
    def lpa(df: org.apache.spark.sql.DataFrame) =
      graft.operators.graph.GraphOps.lpaCommunities(df, 4)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = lpa(edges.toDF("a", "b"))
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Long)]
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var last: Set[(Long, Long)] = Set.empty
    val q = in.toDS().toDF("a", "b").writeStream
      .foreachBatch { (mb: org.apache.spark.sql.DataFrame, _: Long) =>
        seen ++= mb.as[(Long, Long)].collect()
        last = lpa(seen.toSeq.toDF("a", "b"))
        ()
      }.start()
    in.addData(edges.take(3))
    q.processAllAvailable()
    // only the first triangle exists yet
    assert(last.map(_._1) == Set(1L, 2L, 3L))
    in.addData(edges.drop(3))
    q.processAllAvailable()
    q.stop()
    assert(last == batch)
  }

  test("modularityReport: foreachBatch snapshot over accumulated edges " +
      "matches batch (the documented batch-only scoping)") {
    import spark.implicits._
    // Q's normalization is the GLOBAL edge count m — every arriving
    // edge re-weights every community's q_num, so the report is a
    // whole-corpus fact recomputed per snapshot, never incremental
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L), (5L, 6L),
      (6L, 4L), (3L, 4L))
    def report(df: org.apache.spark.sql.DataFrame) = {
      val asg = graft.operators.graph.GraphOps.lpaCommunities(df, 4)
      graft.operators.graph.GraphOps.modularityReport(df, asg)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    }
    val batch = report(edges.toDF("a", "b"))
    assert(batch.forall(_._5 == 7L)) // m = all 7 edges
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Long)]
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var last: Set[(Long, Long, Long, Long, Long, Long)] = Set.empty
    val q = in.toDS().toDF("a", "b").writeStream
      .foreachBatch { (mb: org.apache.spark.sql.DataFrame, _: Long) =>
        seen ++= mb.as[(Long, Long)].collect()
        last = report(seen.toSeq.toDF("a", "b"))
        ()
      }.start()
    in.addData(edges.take(3))
    q.processAllAvailable()
    // the mid-stream snapshot normalizes by ITS OWN m (3 edges)
    assert(last.forall(_._5 == 3L))
    in.addData(edges.drop(3))
    q.processAllAvailable()
    q.stop()
    assert(last == batch)
  }

  test("annVsIndex: runs as a REAL stream (stream-static IVF probe " +
      "join, append mode) and matches batch") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dim = 64
    def v(seed: Int, eps: Float = 0f): Seq[Float] =
      Seq.tabulate(dim)(i =>
        (if (i % (seed + 2) == 0) 1f else -0.1f) + (if (i == 0) eps else 0f))
    val V = graft.operators.vector.VectorOps
    val idxRows = Seq((100L, v(3)), (101L, v(7)), (102L, v(11)))
    val arriving = Seq((1L, v(3, 0.01f)), (2L, v(5)), (3L, v(7, -0.02f)))
    val idxDf = idxRows.toDF("vec_id", "embedding")
    val cents = V.ivfCentroids(idxDf, "vec_id", "embedding", 2)
    val index = V.vectorIndex(idxDf, "vec_id", "embedding", cents)
    def serve(df: org.apache.spark.sql.DataFrame) =
      V.annVsIndex(df, index, "vec_id", "embedding", cents, 0.9, 2)
    val batch = serve(arriving.toDF("vec_id", "embedding"))
      .select("q_id", "id").as[(Long, Long)].collect().toSet
    assert(batch == Set((1L, 100L), (3L, 101L)))
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Seq[Float])]
    // the SAME operator plan, but as an actual continuous query — no
    // foreachBatch: the threshold form is stateless past the
    // stream-static join, so append mode just works
    val q = serve(in.toDS().toDF("vec_id", "embedding")).writeStream
      .format("memory").queryName("vs_vec_serve").outputMode("append")
      .start()
    in.addData(arriving.take(1))
    q.processAllAvailable()
    in.addData(arriving.drop(1))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("vs_vec_serve")
      .select("q_id", "id").as[(Long, Long)].collect().toSet
    assert(got == batch)
  }

  test("exactDedupStream: a hash seen in an earlier micro-batch never " +
      "re-emits; first arrival survives") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = graft.streaming.Streaming.exactDedupStream(
        in.toDS().toDF("doc_id", "text"), col("text"))
      .writeStream.format("memory").queryName("streamdedup")
      .outputMode("append").start()
    in.addData(Seq((0L, "alpha"), (1L, "beta")))
    q.processAllAvailable()
    // batch 2: a dup of "alpha" (different doc_id) and a new doc
    in.addData(Seq((2L, "alpha"), (3L, "gamma")))
    q.processAllAvailable()
    // batch 3: dups of everything — nothing new emits
    in.addData(Seq((4L, "alpha"), (5L, "beta"), (6L, "gamma")))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("streamdedup")
      .select("doc_id", "text").as[(Long, String)].collect().toSet
    assert(got == Set((0L, "alpha"), (1L, "beta"), (3L, "gamma")))
  }

  test("pHash + ngramOverlapF1: row-local given the pair/payload, so " +
      "micro-batch via foreachBatch equals batch exactly") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Seq((1L, "a b a b c", "a b a d"), (2L, "x", "a b"),
      (3L, "the quick fox", "the quick fox"))
    def run(df: org.apache.spark.sql.DataFrame) = {
      val f1 = graft.operators.text.Curation.ngramOverlapF1(df,
        col("pid"), col("cand"), col("ref"), 2)
        .select("pair_id", "f1_milli").as[(Long, Long)].collect().toSet
      val ph = graft.operators.multimodal.Multimodal.pHash(df,
        col("cand"), col("pid"))
        .as[(Long, Long)].collect().toSet
      (f1, ph)
    }
    val batch = run(rows.toDF("pid", "cand", "ref"))
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String, String)]
    var f1s = Set.empty[(Long, Long)]
    var phs = Set.empty[(Long, Long)]
    val q = in.toDS().toDF("pid", "cand", "ref").writeStream
      .foreachBatch { (mb: org.apache.spark.sql.DataFrame, _: Long) =>
        val (f, p) = run(mb); f1s ++= f; phs ++= p; ()
      }.start()
    in.addData(rows.take(1)); q.processAllAvailable()
    in.addData(rows.drop(1)); q.processAllAvailable()
    q.stop()
    assert((f1s, phs) == batch)
  }

  test("bm25Retrieve: arriving queries serve per micro-batch against " +
      "the static posting index via foreachBatch, equals batch " +
      "(per-query rank cuts are batch-local by construction)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val corpus = Seq((1L, "apple banana apple pear"),
      (2L, "banana cherry plum grape"), (3L, "apple kiwi melon fig"),
      (4L, "kiwi melon fig grape")).toDF("doc_id", "text")
    val queries = Seq((100L, "apple banana"), (101L, "grape kiwi"),
      (102L, "cherry"))
    def serve(q: org.apache.spark.sql.DataFrame) =
      graft.operators.text.TextOps.bm25Retrieve(corpus, col("text"),
        col("doc_id"), q, col("qt"), col("q_id"), k = 3)
        .as[(Long, Long, Int, Long)].collect().toSet
    val batch = serve(queries.toDF("q_id", "qt"))
    assert(batch.nonEmpty)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    var got = Set.empty[(Long, Long, Int, Long)]
    val q = in.toDS().toDF("q_id", "qt").writeStream
      .foreachBatch { (mb: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= serve(mb); ()
      }.start()
    in.addData(queries.take(1)); q.processAllAvailable()
    in.addData(queries.drop(1)); q.processAllAvailable()
    q.stop()
    // each query's top-k depends only on its own terms vs the static
    // index, so micro-batch boundaries cannot change any row
    assert(got == batch)
  }

  test("KN perplexity: arriving docs score per micro-batch against the " +
      "STATIC trained pair base via foreachBatch, equals batch") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val T = graft.operators.text.TextOps
    val train = Seq((1L, "a b a b c d"), (2L, "b c a a b d"))
      .toDF("doc_id", "text")
    val trainPairs = T.bigramPairs(train, col("text"), col("doc_id"))
    val held = Seq((9L, "a b c zz a"), (10L, "d a b"), (11L, "c c b a"))
    def score(d: org.apache.spark.sql.DataFrame) =
      T.knPerplexityFromPairs(
        T.bigramPairs(d, col("text"), col("doc_id")), trainPairs)
        .as[(Long, Int, Double, Double)].collect().toSet
    val batch = score(held.toDF("doc_id", "text"))
    assert(batch.size == 3)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    var got = Set.empty[(Long, Int, Double, Double)]
    val q = in.toDS().toDF("doc_id", "text").writeStream
      .foreachBatch { (mb: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= score(mb); ()
      }.start()
    in.addData(held.take(2)); q.processAllAvailable()
    in.addData(held.drop(2)); q.processAllAvailable()
    q.stop()
    assert(got == batch)
  }

  test("audioFp: per-row kernel + generator streams AS-IS in append " +
      "mode, emissions match batch") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // >= 51 tokens so the HK two-frame minimum is met; vary per doc
    val data = (1L to 6L).map { i =>
      Ev(i % 2, i, i.toDouble,
        (0 until (60 + i.toInt * 7)).map(t => s"tok${t % (20 + i)}")
          .mkString(" "))
    }
    def fp(df: org.apache.spark.sql.DataFrame) =
      graft.operators.multimodal.Multimodal.audioFp(df, col("event_type"),
        col("seq")).as[(Long, Int, Int)]
    val batch = fp(data.toDF()).collect().toSet
    assert(batch.nonEmpty)
    val streamed = runStream("audiofp")(in => fp(in.toDS().toDF()))(data)
      .as[(Long, Int, Int)].collect().toSet
    assert(streamed == batch)
  }

  test("incremental BM25: foreachBatch appends each arriving " +
      "micro-batch into the bucketed artifact; the final probe equals " +
      "the one-shot build over everything that arrived") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val S = graft.operators.serve.IncrementalServe
    val docs = (1L to 24L).map(i =>
      (i, (0 until 12).map(t => s"w${(i + t) % 9}").mkString(" ")))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_stream_bm25").toString
    S.reset(spark, "graft_stream_bm25_t", dir)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    // the REFRESH loop as a stream: every micro-batch lands in the
    // SAME bucketed table at its own generation — the index is never
    // rebuilt, exactly the 100 TB maintenance shape
    val q = in.toDS().toDF("doc_id", "text").writeStream
      .foreachBatch { (mb: org.apache.spark.sql.DataFrame, _: Long) =>
        S.appendBm25Batch(mb, col("text"), col("doc_id"),
          "graft_stream_bm25_t", dir, buckets = 4)
        ()
      }.start()
    in.addData(docs.take(8)); q.processAllAvailable()
    in.addData(docs.slice(8, 16)); q.processAllAvailable()
    in.addData(docs.drop(16)); q.processAllAvailable()
    q.stop()
    val all = docs.toDF("doc_id", "text")
    val queries = all.filter(col("doc_id") % 5 === 0)
    val got = S.bm25ProbeIncremental(spark, "graft_stream_bm25_t", dir,
      queries, col("text"), col("doc_id"), k = 3)
      .collect().map(_.toString).toSet
    val oneShot = graft.operators.text.TextOps.bm25Retrieve(all,
      col("text"), col("doc_id"), queries, col("text"), col("doc_id"),
      k = 3).collect().map(_.toString).toSet
    assert(got.nonEmpty && got == oneShot)
  }

  test("bucketed BM25 artifact: a STREAM of queries probes the catalog " +
      "table per micro-batch (foreachBatch — the rank cut needs a " +
      "bounded batch); union of emissions equals the batch probe") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val B = graft.operators.serve.BucketedServe
    val docs = (1L to 30L).map(i =>
      (i, (0 until 15).map(t => s"w${(i * 3 + t) % 11}").mkString(" ")))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_stream_bm25_probe").toString
    B.writeBm25Index(docs, col("text"), col("doc_id"),
      "graft_stream_bm25_probe_t", dir, buckets = 4)
    val qrows = (1L to 6L).map(i =>
      (100L + i, s"w${i % 11} w${(i + 1) % 11}"))
    val batch = B.bm25ProbeIndex(spark, "graft_stream_bm25_probe_t", dir,
      qrows.toDF("q", "t"), col("t"), col("q"), k = 3)
      .collect().map(_.toString).toSet
    assert(batch.nonEmpty)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.Set.empty[String]
    val q = in.toDS().toDF("q", "t").writeStream
      .foreachBatch { (mb: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= B.bm25ProbeIndex(spark, "graft_stream_bm25_probe_t", dir,
          mb, col("t"), col("q"), k = 3).collect().map(_.toString)
        ()
      }.start()
    in.addData(qrows.take(3)); q.processAllAvailable()
    in.addData(qrows.drop(3)); q.processAllAvailable()
    q.stop()
    assert(got.toSet == batch)
  }

  test("bucketed vector artifact: annVsIndex probes the CATALOG table " +
      "as a real append-mode stream (stream-static join over the " +
      "bucketed scan) and matches batch") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dim = 64
    def v(seed: Int, eps: Float = 0f): Seq[Float] =
      Seq.tabulate(dim)(i =>
        (if (i % (seed + 2) == 0) 1f else -0.1f) + (if (i == 0) eps else 0f))
    val V = graft.operators.vector.VectorOps
    val B = graft.operators.serve.BucketedServe
    val idxDf = Seq((100L, v(3)), (101L, v(7)), (102L, v(11)))
      .toDF("vec_id", "embedding")
    val arriving = Seq((1L, v(3, 0.01f)), (2L, v(5)), (3L, v(7, -0.02f)))
    val cents = V.ivfCentroids(idxDf, "vec_id", "embedding", 2)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_stream_cell").toString
    B.writeVectorIndex(idxDf, "vec_id", "embedding", cents,
      "graft_stream_cell_t", dir, buckets = 4)
    def serve(df: org.apache.spark.sql.DataFrame) =
      V.annVsIndex(df, spark.table("graft_stream_cell_t"),
        "vec_id", "embedding", cents, 0.9, 2)
    val batch = serve(arriving.toDF("vec_id", "embedding"))
      .select("q_id", "id").as[(Long, Long)].collect().toSet
    assert(batch == Set((1L, 100L), (3L, 101L)))
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Seq[Float])]
    val q = serve(in.toDS().toDF("vec_id", "embedding")).writeStream
      .format("memory").queryName("vs_cell_catalog")
      .outputMode("append").start()
    in.addData(arriving.take(1)); q.processAllAvailable()
    in.addData(arriving.drop(1)); q.processAllAvailable()
    q.stop()
    val got = spark.table("vs_cell_catalog")
      .select("q_id", "id").as[(Long, Long)].collect().toSet
    assert(got == batch)
  }
}
