package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions

/** faxe-style dot-path field addressing compiled to Catalyst columns.
  *
  * Semantics pinned by the reference's data-model tests
  * (`/root/reference/apps/faxe/test/flowdata_tests.erl:26-88`):
  *   - dot-separated segments: `a.b.c`
  *   - `[n]` array indexing, 1-based (jsn semantics): `this[2].is.my.paths[2].id`
  *   - `*` accepted as an alternate separator (`dfs/array_explode.dfs:6`)
  *
  * Reads compile to `getField`/`element_at` chains; deep writes use
  * `Column.withField` / `dropFields` (no UDFs, fully codegen-able).
  * Root-level paths take the `withColumn`/`drop` fast path, mirroring the
  * reference's root fast path (`esp_set.erl:41-47`).
  */
object Paths {
  final case class Seg(name: String, idx: Option[Int])

  def parse(path: String): Seq[Seg] = {
    // `*` escapes a literal dot INSIDE one key (esp_fields_to_array.erl:60
    // outputs the name with * back-replaced by dots; dfs/test/http_post.dfs
    // 'SHx*OpHrRet' addresses the flat JSON key "SHx.OpHrRet") — it is NOT
    // an alternate separator: segments split on '.' first, then '*' inside
    // a segment becomes a literal '.' in that segment's name.
    path.split('.').toSeq.map { s0 =>
      val s = s0.replace('*', '.')
      val i = s.indexOf('[')
      if (i >= 0 && s.endsWith("]"))
        Seg(s.substring(0, i), Some(s.substring(i + 1, s.length - 1).toInt))
      else Seg(s, None)
    }
  }

  // ---- lenient resolution (DFS front-end only) --------------------------
  // The reference's lambdas return `undefined` for a field the point does
  // not carry (flowdata field lookup — data-dependent, never a compile
  // error), so verbatim scripts routinely reference paths absent from a
  // given stream. Inside a lenient scope, roots recorded as missing
  // resolve to NULL literals instead of failing analysis; the DFS planner
  // (DfsEngine.planChain) records them by catching UNRESOLVED_COLUMN and
  // replanning. Non-DFS operator API use stays strict (no scope → no-op).
  private val lenientMissing = new ThreadLocal[java.util.HashSet[String]]

  def lenientScope[T](body: => T): T = {
    val prev = lenientMissing.get
    lenientMissing.set(new java.util.HashSet[String])
    try body finally lenientMissing.set(prev)
  }

  /** Record `root` as known-missing. False when not in a lenient scope or
    * already recorded (→ the caller must rethrow, no progress possible).
    */
  def addLenientMissing(root: String): Boolean =
    Option(lenientMissing.get).exists(_.add(root))

  private def knownMissing(root: String): Boolean =
    Option(lenientMissing.get).exists(_.contains(root))

  /** Column reference for a dot-path (1-based array indexing). */
  def ref(path: String): Column = {
    val segs = parse(path)
    if (knownMissing(segs.head.name)) return functions.lit(null)
    // backtick-quote the root: a *-escaped name carries literal dots that
    // col() would otherwise re-split into nesting
    val head = withIdx(functions.col(s"`${segs.head.name}`"), segs.head.idx)
    segs.tail.foldLeft(head)((c, s) => withIdx(c.getField(s.name), s.idx))
  }

  private def withIdx(c: Column, idx: Option[Int]): Column =
    idx.map(i => functions.element_at(c, i)).getOrElse(c)

  /** Deep set — creates or overwrites the field at `path`; an absent root
    * struct is created (flowdata set_field creates intermediate maps,
    * flowdata_tests.erl:73-80).
    */
  def set(df: DataFrame, path: String, value: Column): DataFrame = {
    val segs = parse(path)
    require(segs.forall(_.idx.isEmpty), s"cannot write to array element: $path")
    if (segs.size == 1) df.withColumn(segs.head.name, value)
    else {
      val root = segs.head.name
      val rest = segs.tail.map(_.name)
      if (df.columns.contains(root))
        df.withColumn(root,
          functions.col(root).withField(rest.mkString("."), value))
      else {
        // build the nested struct bottom-up from the new value
        val nested = rest.foldRight(value)((name, inner) =>
          functions.struct(inner.as(name)))
        df.withColumn(root, nested)
      }
    }
  }

  /** Deep delete of the field at `path`. */
  def delete(df: DataFrame, path: String): DataFrame = {
    val segs = parse(path)
    require(segs.forall(_.idx.isEmpty), s"cannot delete array element: $path")
    if (segs.size == 1) df.drop(segs.head.name)
    else {
      val root = segs.head.name
      val rest = segs.tail.map(_.name).mkString(".")
      df.withColumn(root, functions.col(root).dropFields(rest))
    }
  }

  /** Whether the path resolves against the DataFrame's schema. */
  def has(df: DataFrame, path: String): Boolean =
    try { df.select(ref(path)); true }
    catch { case _: org.apache.spark.sql.AnalysisException => false }
}
