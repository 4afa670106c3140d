package graft.operators.stateless

import graft.core.Paths
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stateless per-row operators (SURVEY §2.1).
  *
  * Every operator is a pure `DataFrame => DataFrame` transform built from
  * Catalyst expressions — filters and projections stay pushdown-able and
  * inside whole-stage codegen; nothing here shuffles.
  */
object Transforms {

  /** `where` — predicate filter (ref: esp_where.erl:22-47). */
  def where(df: DataFrame, predicate: Column): DataFrame = df.filter(predicate)

  /** `eval` — N expressions evaluated sequentially, each sees the previous
    * results (ref: esp_eval.erl:24-62). `withColumn`-chain preserves the
    * sequential visibility; Catalyst collapses the chain into one Project.
    */
  def eval(df: DataFrame, exprs: Seq[(String, DataFrame => Column)]): DataFrame =
    exprs.foldLeft(df) { case (d, (as, mk)) => Paths.set(d, as, mk(d)) }

  /** `set` — unconditional field write, deep paths ok (ref: esp_set.erl:28-60). */
  def setFields(df: DataFrame, fields: Seq[(String, Column)]): DataFrame =
    fields.foldLeft(df) { case (d, (p, v)) => Paths.set(d, p, v) }

  /** `default` — write only where absent or null (ref: esp_default.erl:26-70). */
  def default(df: DataFrame, path: String, value: Column): DataFrame =
    if (!Paths.has(df, path)) Paths.set(df, path, value)
    else Paths.set(df, path, coalesce(Paths.ref(path), value))

  /** `delete` — drop fields, optionally gated by a predicate: when the gate
    * holds the field is nulled, otherwise kept (ref: esp_delete.erl:26-63).
    */
  def delete(df: DataFrame, paths: Seq[String]): DataFrame =
    // deleting an absent path is a no-op (faxe flowdata semantics;
    // dfs/test/delete.dfs deletes paths its docs don't carry)
    paths.filter(Paths.has(df, _)).foldLeft(df)(Paths.delete)

  def deleteWhen(df: DataFrame, path: String, gate: Column): DataFrame =
    Paths.set(df, path, when(gate, lit(null)).otherwise(Paths.ref(path)))

  /** `keep` — projection with optional rename (ref: esp_keep.erl:22-47,
    * semantics pinned by its own eunit cases at :48-69):
    *  - an ALIAS is itself a path — `first.val44` kept as `erster.val`
    *    lands nested under a fresh `erster` struct;
    *  - an un-aliased deep path keeps its nesting (`first.val44` →
    *    `{first: {val44: …}}`), it does NOT flatten to the leaf;
    *  - absent source paths are dropped together with their alias
    *    (rewrite's `V /= undefined` filter), never kept as nulls.
    */
  def keep(df: DataFrame, fields: Seq[(String, Option[String])]): DataFrame = {
    val present = fields.filter { case (p, _) => Paths.has(df, p) }
    // out path = the alias (a path in its own right) or the FULL source
    // path; stage values under temp columns first so output roots can
    // collide with (pruned) source roots without capture. The NUL-prefix
    // makes the temps collision-proof against user columns (the same
    // reserved space Paths' markers use); every staged ref resolves
    // against the ORIGINAL df, so one projection stages them all.
    val staged = present.zipWithIndex.map { case ((src, as), i) =>
      ("\u0000keep" + i, Paths.ref(src), as.getOrElse(src))
    }
    val cleared = df.select(staged.map { case (t, v, _) => v.as(t) }: _*)
    val rebuilt = staged.foldLeft(cleared) { case (d, (t, _, out)) =>
      Paths.set(d, out, col(s"`$t`"))
    }
    rebuilt.drop(staged.map(_._1): _*)
  }

  /** `rename` — rename fields in place, deep paths included (ref:
    * esp_rename.erl:27-60): a dotted source path moves the nested field
    * (set at the new path + delete the old); top-level names rename in
    * place. Missing sources are a no-op, and presence AND values are
    * judged against the ORIGINAL point, not the partially-renamed one:
    * flowdata_tests.erl rename_field_undefined_test pins that
    * `val->value.into.deep, value->my_value` leaves no `my_value` even
    * though the first rename creates a `value` root. Staging every
    * source value in one projection (as `keep` does) gives that
    * snapshot semantics. Lambda-computed (per-row) names have no
    * relational analog — those map to a map column instead (SURVEY
    * §2.1 note).
    */
  def rename(df: DataFrame, renames: Seq[(String, String)]): DataFrame = {
    val present = renames.filter { case (from, _) => Paths.has(df, from) }
    if (present.isEmpty) df
    else {
      val staged = present.zipWithIndex.map { case ((from, to), i) =>
        ("\u0000ren" + i, from, to)
      }
      val withTemps = df.select(
        col("*") +: staged.map { case (t, from, _) => Paths.ref(from).as(t) }: _*)
      val deleted = staged.foldLeft(withTemps) { case (d, (_, from, _)) =>
        Paths.delete(d, from)
      }
      val rebuilt = staged.foldLeft(deleted) { case (d, (t, _, to)) =>
        Paths.set(d, to, col(s"`$t`"))
      }
      rebuilt.drop(staged.map(_._1): _*)
    }
  }

  /** `case` — first-true branch list with default (ref: esp_case.erl:28-66). */
  def caseWhen(
      df: DataFrame,
      as: String,
      branches: Seq[(Column, Column)],
      otherwise: Column): DataFrame = {
    val c = branches.tail
      .foldLeft(when(branches.head._1, branches.head._2)) {
        case (acc, (p, v)) => acc.when(p, v)
      }
      .otherwise(otherwise)
    Paths.set(df, as, c)
  }

  /** `if` — ternary into `as` (ref: esp_if.erl:25-58). */
  def ifThen(df: DataFrame, as: String, test: Column, thenV: Column, elseV: Column): DataFrame =
    Paths.set(df, as, when(test, thenV).otherwise(elseV))

  /** `sample` rate mode — pass every Nth row in `order` within `partition`
    * (ref: esp_sample.erl:27-67). Keyed form ranks inside each key
    * partition; the global form uses the two-pass partition-offset scheme
    * ([[GlobalOrder.rowNumber]]) so no single task sees all rows.
    */
  def sampleEveryN(df: DataFrame, n: Int, order: Seq[Column], partition: Seq[Column] = Nil): DataFrame = {
    val numbered =
      if (partition.isEmpty) GlobalOrder.rowNumber(df, order, "_rn")
      else {
        val w = Window.partitionBy(partition: _*).orderBy(order: _*)
        df.withColumn("_rn", row_number().over(w))
      }
    numbered.filter(col("_rn") % n === 1).drop("_rn")
  }

  /** `sample` duration mode — first row per time bucket. */
  def sampleFirstPer(df: DataFrame, ts: Column, bucketMs: Long, order: Seq[Column]): DataFrame = {
    val bucket = (unix_millis(ts) / bucketMs).cast("long")
    val w = Window.partitionBy(bucket).orderBy(order: _*)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** `shift` — shift timestamps by a signed duration (ref: esp_shift.erl:22-39). */
  def shift(df: DataFrame, tsCol: String, byMs: Long): DataFrame =
    df.withColumn(tsCol, timestamp_millis(unix_millis(col(tsCol)) + byMs))

  /** `jsonsize` — byte size of a JSON payload (ref: esp_jsonsize.erl:22-37). */
  def jsonSize(df: DataFrame, payload: Column, as: String): DataFrame =
    df.withColumn(as, octet_length(payload).cast("long"))
}
