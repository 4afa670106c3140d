package graft.operators.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle counting and local clustering coefficient over an
  * undirected pair list — the link-graph cohesion signals web-corpus
  * curation ranks hosts by (spam farms and boilerplate mirror rings
  * are low-clustering star/bipartite shapes; organic communities are
  * triangle-dense), and the third member of the published host-signal
  * family next to [[GraphOps.pageRank]] and harmonic centrality.
  *
  * Algorithm: degree orientation (the MapReduce-era "compact-forward"
  * form — Suri & Vassilvitskii 2011, "Counting Triangles and the Curse
  * of the Last Reducer"). Each undirected edge {a, b} is directed from
  * its lower endpoint to its higher under the total order
  * (degree, id); every triangle then has EXACTLY ONE wedge vertex with
  * two out-edges, so
  *   wedges:    e1(s→x) ⨝ e2(s→y) on s, with x before y
  *   triangles: wedge (x, y) ⨝ oriented edge (x→y)
  * counts each triangle once, and — the reason this survives skew —
  * a node's ORIENTED out-degree is O(√m) regardless of its raw degree
  * (a celebrity node's million edges orient INTO it), so the wedge
  * set is Σ d_out² ≤ m^{3/2}, never the Σ d² of a naive neighbor
  * self-join. All shuffles are key equi-joins (s, then (x, y)); all
  * arithmetic is exact integers.
  *
  * Returns one row per node: `(id, degree, triangles, lcc_nano)` with
  * lcc = 2·T / (d·(d−1)) in truncating nano fixed point (0 for
  * degree < 2) — exact integer division, so the oracle replays it
  * bit-for-bit.
  */
object Triangles {

  def triangleCounts(pairs: DataFrame): DataFrame = {
    // canonical undirected simple graph: (u < v) distinct, no loops
    val und = pairs.select(
        least(col("a"), col("b")).as("u"),
        greatest(col("a"), col("b")).as("v"))
      .filter(col("u") =!= col("v")).distinct().localCheckpoint()
    val deg = und.select(col("u").as("id"))
      .unionByName(und.select(col("v").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("degree"))
    // orient by (degree, id): lower endpoint -> higher endpoint
    val du = deg.select(col("id").as("u"), col("degree").as("_du"))
    val dv = deg.select(col("id").as("v"), col("degree").as("_dv"))
    val oriented = und.join(du, "u").join(dv, "v")
      .select(
        when(col("_du") < col("_dv") ||
            (col("_du") === col("_dv") && col("u") < col("v")),
          struct(col("u").as("s"), col("v").as("t"),
            col("_dv").as("_dt")))
          .otherwise(struct(col("v").as("s"), col("u").as("t"),
            col("_du").as("_dt"))).as("_e"))
      .select(col("_e.s"), col("_e.t"), col("_e._dt"))
      .localCheckpoint()
    // wedges from each source's out-pairs, ordered so (x, y) matches
    // the orientation the closing edge would carry
    val e1 = oriented.select(col("s"), col("t").as("x"),
      col("_dt").as("_dx"))
    val e2 = oriented.select(col("s"), col("t").as("y"),
      col("_dt").as("_dy"))
    val wedges = e1.join(e2, "s")
      .filter(col("_dx") < col("_dy") ||
        (col("_dx") === col("_dy") && col("x") < col("y")))
      .select(col("s"), col("x"), col("y"))
    val closing = oriented.select(col("s").as("x"), col("t").as("y"))
    val tris = wedges.join(closing, Seq("x", "y"))
    // each triangle increments all three corners
    val perNode = tris
      .select(explode(array(col("s"), col("x"), col("y"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("triangles"))
    deg.join(perNode, Seq("id"), "left")
      .select(col("id"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
      .withColumn("lcc_nano",
        when(col("degree") >= 2,
          expr(s"(triangles * 2 * ${GraphOps.Nano}) div " +
            "(degree * (degree - 1))"))
          .otherwise(lit(0L)))
  }
}
