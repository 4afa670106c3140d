package graft.operators.series

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Time-series similarity search over keyed event streams — the
  * distributed series-search family (EDBT'19 streaming similarity
  * search, ICDE'21 distributed top-k trajectory similarity): rank keys
  * by how closely their recent value series matches a query pattern,
  * under z-normalized Euclidean distance (the UCR-suite standard: shape
  * match, offset/scale invariant).
  *
  * Determinism contract: per-key series are ordered by (order columns,
  * then the caller's unique tiebreak) and folded sequentially with a
  * DOUBLE accumulator (the dotSql fold the DuckDB oracle replays);
  * mean/std use the one fixed formula `sqrt(Σv²/m − mean²)`; the top-k
  * cut orders by the ROUNDED distance with the key as tiebreak (the
  * bm25 boundary rule).
  *
  * 100 TB shape: the last-m cut is a key-partitioned window (state =
  * m rows per key, bounded); per-key series are m doubles — the
  * distance pass moves one m-vector per KEY, not per event; the cut is
  * TakeOrderedAndProject. No global sort, no cross-key join.
  */
object Series {

  /** Per-key last-`m` values as a time-ascending array: keys with
    * fewer than m points are dropped (z-normalized distance needs
    * equal lengths). `orderBy` must end in a unique column (e.g.
    * event_id) — ties would otherwise make the cut nondeterministic.
    */
  def keySeries(df: DataFrame, key: Column, orderBy: Seq[Column],
      value: Column, m: Int): DataFrame = {
    val base = df.select(
      key.as("key") +: value.cast("double").as("_v") +:
        orderBy.zipWithIndex.map { case (c, i) => c.as(s"_o$i") }: _*)
    val w = Window.partitionBy(col("key"))
      .orderBy(orderBy.indices.map(i => col(s"_o$i").desc): _*)
    base.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= m)
      .groupBy(col("key"))
      .agg(count(lit(1)).as("_n"),
        transform(
          sort_array(collect_list(struct((-col("_rn")).as("o"),
            col("_v").as("v")))),
          x => x.getField("v")).as("series"))
      .filter(col("_n") === m)
      .select(col("key"), col("series"))
  }

  /** Z-normalize a query pattern driver-side (the literals embed in
    * both the Spark plan and the oracle SQL, so both engines see the
    * same normalized values bit-for-bit).
    */
  def zNormQuery(q: Seq[Double]): Seq[Double] = {
    val m = q.size
    val mean = q.sum / m
    val std = math.sqrt(q.map(v => v * v).sum / m - mean * mean)
    if (std == 0) q.map(_ => 0.0) else q.map(v => (v - mean) / std)
  }

  /** Top-`k` keys by z-normalized Euclidean distance between each
    * key's series and the (already normalized) query. Flat series
    * (std = 0) z-normalize to the zero vector.
    */
  def zNormTopK(series: DataFrame, qNorm: Seq[Double], k: Int): DataFrame = {
    val m = qNorm.size
    val qArr = array(qNorm.map(lit(_)): _*)
    val s = series
      .withColumn("_s1",
        aggregate(col("series"), lit(0.0), (a, v) => a + v))
      .withColumn("_s2",
        aggregate(col("series"), lit(0.0), (a, v) => a + v * v))
      .withColumn("_mean", col("_s1") / m)
      .withColumn("_m2", col("_s2") / m)
      .withColumn("_std", sqrt(col("_m2") - col("_mean") * col("_mean")))
    val d2 = aggregate(
      zip_with(col("series"), qArr, (x, q) => {
        val z = when(col("_std") === 0, lit(0.0))
          .otherwise((x - col("_mean")) / col("_std"))
        (z - q) * (z - q)
      }),
      lit(0.0), (a, v) => a + v)
    s.withColumn("dist", round(sqrt(d2), 6))
      .orderBy(col("dist"), col("key"))
      .limit(k)
      .select(col("key"), col("dist"))
  }

  /** End-to-end: last-`m` series per key, ranked against `query`
    * (normalized here; pass the SAME raw query to the oracle builder).
    */
  def seriesTopK(df: DataFrame, key: Column, orderBy: Seq[Column],
      value: Column, query: Seq[Double], k: Int): DataFrame =
    zNormTopK(keySeries(df, key, orderBy, value, query.size),
      zNormQuery(query), k)

  /** Per-key FULL series (time-ascending array) — the subsequence-search
    * base. Same ordering/tiebreak contract as [[keySeries]]. A key's
    * whole history lands in one array: bound it upstream (time-range
    * filter) when histories are unbounded.
    */
  def fullSeries(df: DataFrame, key: Column, orderBy: Seq[Column],
      value: Column): DataFrame = {
    val base = df.select(
      key.as("key") +: value.cast("double").as("_v") +:
        orderBy.zipWithIndex.map { case (c, i) => c.as(s"_o$i") }: _*)
    base
      .groupBy(col("key"))
      .agg(transform(
        sort_array(collect_list(struct(
          struct(orderBy.indices.map(i => col(s"_o$i")): _*).as("o"),
          col("_v").as("v")))),
        x => x.getField("v")).as("series"))
  }

  /** Subsequence search (the UCR-suite problem): for each key, the
    * offset of the window of length |query| whose z-normalized distance
    * to the query is smallest, with that distance. Scans all
    * `L − m + 1` windows per key with a per-window mean/std — O(L·m)
    * per key, one row per key in and out; keys shorter than the query
    * are dropped. `best_off` is 1-based; earliest offset wins ties.
    *
    * Runs on the native [[graft.functions.ZNormBestMatch]] scan (one
    * compiled loop per key row — 36 s → sub-second at sf0.1); the HOF
    * twin [[bestMatchHof]] computes the identical value and the unit
    * A/B pins them equal.
    */
  def bestMatch(series: DataFrame, qNorm: Seq[Double]): DataFrame = {
    val m = qNorm.size
    val res = graft.functions.SeriesExpressions.znormBestMatch(
      col("series"), array(qNorm.map(lit(_)): _*))
    series.filter(size(col("series")) >= m)
      .withColumn("_b", res)
      .select(col("key"),
        element_at(col("_b"), 1).cast("int").as("best_off"),
        round(sqrt(element_at(col("_b"), 2)), 6).as("dist"))
  }

  /** Interpreted-HOF twin of [[bestMatch]] — the expression-level spec
    * the native scan is pinned against (the FloatDot A/B precedent).
    */
  def bestMatchHof(series: DataFrame, qNorm: Seq[Double]): DataFrame = {
    val m = qNorm.size
    val qArr = array(qNorm.map(lit(_)): _*)
    val s = series.filter(size(col("series")) >= m)
    // fold over window starts carrying (bestOff, bestDist²); each start
    // computes its window's sums, then the z-normalized distance
    val best = aggregate(
      sequence(lit(1), size(col("series")) - (m - 1)),
      struct(lit(0).as("off"), lit(Double.MaxValue).as("d2")),
      (acc, i) => {
        val win = slice(col("series"), i, lit(m))
        val s1 = aggregate(win, lit(0.0), (a, v) => a + v)
        val s2 = aggregate(win, lit(0.0), (a, v) => a + v * v)
        val mean = s1 / m
        val std = sqrt(s2 / m - mean * mean)
        val d2 = aggregate(
          zip_with(win, qArr, (x, q) => {
            val z = when(std === 0, lit(0.0)).otherwise((x - mean) / std)
            (z - q) * (z - q)
          }),
          lit(0.0), (a, v) => a + v)
        struct(
          when(d2 < acc.getField("d2"), i).otherwise(acc.getField("off"))
            .as("off"),
          when(d2 < acc.getField("d2"), d2).otherwise(acc.getField("d2"))
            .as("d2"))
      })
    s.withColumn("_b", best)
      .select(col("key"), col("_b.off").as("best_off"),
        round(sqrt(col("_b.d2")), 6).as("dist"))
  }

  /** Gaussian breakpoints for SAX alphabets (Lin et al. 2003) — the
    * equiprobable cut points of N(0,1) for alphabet sizes 3–6. */
  val SaxBreakpoints: Map[Int, Seq[Double]] = Map(
    3 -> Seq(-0.4307272992954576, 0.4307272992954576),
    4 -> Seq(-0.6744897501960817, 0.0, 0.6744897501960817),
    5 -> Seq(-0.8416212335729142, -0.2533471031357997,
      0.2533471031357997, 0.8416212335729142),
    6 -> Seq(-0.9674215661017014, -0.4307272992954576, 0.0,
      0.4307272992954576, 0.9674215661017014))

  /** SAX symbolization (iSAX-family series indexing): z-normalize each
    * key's series, average it into `w` equal segments (PAA), and map
    * each segment mean to a letter by the Gaussian breakpoints —
    * appending the `w`-letter `sax` word. Two series with equal words
    * are distance-bounded candidates: group or join on `sax` for the
    * candidate-prefilter → exact-verify pattern (the LSH shape, for
    * series). Per-row arithmetic only — scan-cost at any corpus.
    * Series length must be divisible by `w` (PAA segments must align
    * for words to be comparable).
    */
  def withSax(series: DataFrame, w: Int, alphabet: Int = 4): DataFrame = {
    val bps = SaxBreakpoints.getOrElse(alphabet,
      throw new IllegalArgumentException(
        s"sax: alphabet $alphabet not in ${SaxBreakpoints.keys.toSeq.sorted}"))
    val letters = "abcdef"
    val s = series.filter(size(col("series")) % w === 0)
      .withColumn("_m", size(col("series")))
      .withColumn("_s1",
        aggregate(col("series"), lit(0.0), (a, v) => a + v))
      .withColumn("_s2",
        aggregate(col("series"), lit(0.0), (a, v) => a + v * v))
      .withColumn("_mean", col("_s1") / col("_m"))
      .withColumn("_std",
        sqrt(col("_s2") / col("_m") - col("_mean") * col("_mean")))
      .withColumn("_seg", (col("_m") / w).cast("int"))
    val paa = transform(sequence(lit(1), lit(w)), j => {
      val seg = slice(col("series"),
        (j - 1) * col("_seg") + 1, col("_seg"))
      val segMean =
        aggregate(seg, lit(0.0), (a, v) => a + v) / col("_seg")
      when(col("_std") === 0, lit(0.0))
        .otherwise((segMean - col("_mean")) / col("_std"))
    })
    // first-true-wins when() chain over ASCENDING breakpoints: the
    // smallest is checked first, so each value lands in its lowest band
    val letter = (v: Column) =>
      bps.tail.zipWithIndex.foldLeft(
        when(v < bps.head, letters(0).toString)) {
        case (acc, (bp, i)) => acc.when(v < bp, letters(i + 1).toString)
      }.otherwise(letters(bps.size).toString)
    s.withColumn("sax",
        concat_ws("", transform(paa, v => letter(v))))
      .drop("_m", "_s1", "_s2", "_mean", "_std", "_seg")
  }

  /** Series near-duplicate pairs — the LSH shape for series, composed
    * from [[withSax]]: keys sharing a SAX word are candidates (bucket
    * self-join, per-bucket cap — never all-pairs), verified by exact
    * z-normalized distance ≤ `maxDist`. Returns `(a, b, dist)` with
    * `a < b`. Same plan skeleton as `Dedup.nearDupPairs`: symbolize →
    * bucket → cap → self-join → exact verify on candidates only.
    */
  def saxDupPairs(series: DataFrame, w: Int = 4, alphabet: Int = 4,
      maxDist: Double = 1.0,
      maxBucketSize: Int = 4096): DataFrame = {
    val sax = withSax(series, w, alphabet)
      .select(col("key"), col("series"), col("sax"))
    graft.core.CacheScope.withPersisted(sax) { base =>
      val cap = org.apache.spark.sql.expressions.Window
        .partitionBy(col("sax")).orderBy(col("key"))
      val capped = base.withColumn("_r", row_number().over(cap))
        .filter(col("_r") <= maxBucketSize)
      val l = capped.select(col("sax"), col("key").as("a"),
        col("series").as("_xa"))
      val r = capped.select(col("sax").as("_sx"), col("key").as("b"),
        col("series").as("_xb"))
      val cand = l.join(r, col("sax") === col("_sx") && col("a") < col("b"))
      // exact z-norm distance between the two series — native
      // (graft.functions.ZNormDistSq): this runs once per candidate
      // PAIR, and skewed SAX buckets make pairs plentiful, so the
      // interpreted fold would sit inside the join (measured 45.7 s at
      // sf0.1; native sub-second). Arithmetic identical to the oracle's
      // fold replay.
      val d2 = graft.functions.SeriesExpressions
        .znormDistSq(col("_xa"), col("_xb"))
      cand.withColumn("dist", round(sqrt(d2), 6))
        .filter(col("dist") <= maxDist)
        .select(col("a"), col("b"), col("dist"))
    }
  }
}
