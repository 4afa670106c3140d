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
    val norm =
      if (path.contains('*') && !path.contains('.')) path.replace('*', '.')
      else path
    norm.split('.').toSeq.map { s =>
      val i = s.indexOf('[')
      if (i >= 0 && s.endsWith("]"))
        Seg(s.substring(0, i), Some(s.substring(i + 1, s.length - 1).toInt))
      else Seg(s, None)
    }
  }

  /** Column reference for a dot-path (1-based array indexing). */
  def ref(path: String): Column = {
    val segs = parse(path)
    val head = withIdx(functions.col(segs.head.name), segs.head.idx)
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
