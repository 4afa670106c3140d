package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions

/** faxe-style dot-path field addressing compiled to Catalyst columns.
  *
  * Semantics pinned by the reference's data-model tests
  * (`/root/reference/apps/faxe/test/flowdata_tests.erl:26-88`):
  *   - dot-separated segments: `a.b.c`
  *   - `[n]` array indexing, 1-based (jsn semantics): `this[2].is.my.paths[2].id`
  *   - `*` escapes a literal dot inside one key (`esp_fields_to_array.erl:60`;
  *     `dfs/test/http_post.dfs` flat `SHx.OpHrRet` keys)
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

  /** Finer-grained lenient markers (NUL-prefixed so they can never
    * collide with a real column name):
    *
    *  - [[deepMarker]]: the root EXISTS but is a scalar — only refs that
    *    extract INTO it (`"val.deep"`) are undefined; a bare `"val"` must
    *    keep resolving to the real column (recording the bare root here
    *    would silently null valid scalar refs in the same node).
    *  - [[leafMarker]]: a struct exists but lacks the named subfield —
    *    Spark's FIELD_NOT_FOUND reports only the missing field name, so
    *    the marker nulls deep refs whose extraction path uses that name.
    */
  // lower-cased: the record side carries Spark's schema-cased rendering
  // while lookups carry the script's spelling, and resolution is
  // case-insensitive — the marker must match either way
  def deepMarker(root: String): String =
    "\u0000deep:" + root.toLowerCase(java.util.Locale.ROOT)
  def leafMarker(field: String): String =
    "\u0000leaf:" + field.toLowerCase(java.util.Locale.ROOT)

  /** When a walk marker for leaf `x` is recorded, [[ref]] nulls exactly
    * the deep paths whose extraction OF `x` the node-input schema proves
    * impossible (the parent struct lacks it) — per-path precision the
    * coarse leaf marker cannot give (`"a.x"` invalid, `"b.x"` valid).
    * Scoped to the failing leaf so paths over OTHER fields are never
    * judged: a ref like `"a.y"` that only resolves against the node's
    * mid-plan extended frame (a root the same node redefined) is left
    * strictly alone. Known limit: a root redefined mid-node to ADD the
    * failing leaf itself is still judged by the input schema (the
    * evolving frame is not visible here). Activated on RETRY only.
    */
  def walkMarker(leaf: String): String = "\u0000walk:" + leaf
  private val WalkPrefix = "\u0000walk:"

  /** Cheap presence flag recorded alongside any walk marker, so the
    * common no-marker case costs one contains() instead of a set scan.
    */
  val WalkFlag: String = "\u0000walk#"

  private val lenientSchema =
    new ThreadLocal[Option[org.apache.spark.sql.types.StructType]] {
      override def initialValue(): Option[org.apache.spark.sql.types.StructType] = None
    }

  def withLenientSchema[T](
      schema: Option[org.apache.spark.sql.types.StructType])(body: => T): T = {
    val prev = lenientSchema.get
    lenientSchema.set(schema)
    try body finally lenientSchema.set(prev)
  }

  /** True when the schema PROVES the path cannot extract `leaf`: the
    * walk reaches a segment named `leaf` (case-insensitively, matching
    * Spark's default resolution) whose parent struct lacks it. Any other
    * outcome — unknown root, map/array navigation, a scalar base (the
    * INVALID_EXTRACT handler's territory), `leaf` present — is not
    * proven and the path resolves strictly.
    */
  private def provenLacking(st: org.apache.spark.sql.types.StructType,
      segs: Seq[Seg], leaf: String): Boolean = {
    import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}
    def field(stt: StructType, name: String) =
      stt.fields.find(_.name.equalsIgnoreCase(name))
    def step(t: DataType, idx: Option[Int]): Option[DataType] = idx match {
      case None => Some(t)
      case Some(_) => t match {
        case a: ArrayType => Some(a.elementType)
        case _ => None
      }
    }
    def walk(t: DataType, rest: Seq[Seg]): Boolean = rest match {
      case Seq() => false
      case s +: more => t match {
        case stt: StructType =>
          if (s.name.equalsIgnoreCase(leaf) && field(stt, s.name).isEmpty)
            true
          else field(stt, s.name) match {
            case None => false // different missing leaf: not this marker's call
            case Some(f) => step(f.dataType, s.idx).exists(walk(_, more))
          }
        case _ => false
      }
    }
    field(st, segs.head.name) match {
      case None => false
      case Some(f) => step(f.dataType, segs.head.idx)
        .exists(walk(_, segs.tail))
    }
  }


  /** Un-record a root after the failing plan step succeeded — a name one
    * node's stream lacks may exist perfectly well in a later node or a
    * sibling chain (the planned frame keeps its baked-in NULLs; only the
    * RESOLUTION default reverts to strict).
    */
  def removeLenientMissing(root: String): Unit =
    Option(lenientMissing.get).foreach(_.remove(root))

  private def knownMissing(root: String): Boolean =
    Option(lenientMissing.get).exists(_.contains(root))

  /** Column reference for a dot-path (1-based array indexing). */
  def ref(path: String): Column = {
    val segs = parse(path)
    val lm = lenientMissing.get
    if (lm == null || lm.isEmpty) return strictRef(segs)
    if (lm.contains(segs.head.name)) return functions.lit(null)
    if (segs.tail.nonEmpty) {
      // deep markers apply to every PROPER prefix of the path: a scalar
      // base may sit below the root ("a.b.c" failing with base "a.b"),
      // and any extraction past it is equally undefined. (The error's
      // base renders '*'-escaped flat keys with plain dots, so a flat
      // "a.b" column and a nested a.b path share one marker string —
      // inherent to the error's rendering, pathological in practice.)
      val prefixes = (1 until segs.length)
        .map(i => segs.take(i).map(_.name).mkString("."))
      if (prefixes.exists(pfx => lm.contains(deepMarker(pfx))) ||
          segs.tail.exists(s => lm.contains(leafMarker(s.name))))
        return functions.lit(null)
      if (lm.contains(WalkFlag)) {
        val walkLeaves = Option(lenientMissing.get).map(m =>
          m.toArray(Array.empty[String]).toSeq
            .filter(_.startsWith(WalkPrefix)).map(_.stripPrefix(WalkPrefix)))
          .getOrElse(Seq.empty)
        if (walkLeaves.nonEmpty && lenientSchema.get.exists(st =>
            walkLeaves.exists(provenLacking(st, segs, _))))
          return functions.lit(null)
      }
    }
    strictRef(segs)
  }

  // backtick-quote the root: a *-escaped name carries literal dots that
  // col() would otherwise re-split into nesting
  private def strictRef(segs: Seq[Seg]): Column = {
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
    require(segs.head.idx.isEmpty, s"cannot write to an array-element root: $path")
    if (segs.size == 1) df.withColumn(segs.head.name, value)
    else {
      val root = segs.head.name
      if (df.columns.contains(root)) {
        if (segs.tail.forall(_.idx.isEmpty))
          // schema-aware walk, NOT withField("a.b", v): Spark's dotted
          // withField requires every intermediate to exist, while the
          // reference's jsn:set creates missing intermediate maps
          // (flowdata_tests.erl:73-80) — and replaces a scalar
          // intermediate with a fresh map
          df.withColumn(root, deepSet(functions.col(s"`$root`"),
            df.schema(root).dataType, segs.tail, value))
        else
          // an [n] segment mid-path writes INSIDE an array element
          // (json_test.dfs 'data.mt[1].ccRdy'): rebuild the array with
          // `transform`, rewriting only the addressed element — columnar,
          // no UDF, the rest of the array unchanged
          df.withColumn(root,
            updated(functions.col(s"`$root`"), df.schema(root).dataType,
              segs.tail, value, None))
      } else
        // build the nested value bottom-up; an indexed segment becomes an
        // n-slot array with the value in slot n (jsn list creation)
        df.withColumn(root, fresh(segs.tail, value))
    }
  }

  private def fresh(segs: Seq[Seg], value: Column): Column =
    segs.foldRight(value) { (seg, inner) =>
      val v = seg.idx match {
        case Some(i) => functions.array(
          (Seq.fill(i - 1)(functions.lit(null)) :+ inner): _*)
        case None => inner
      }
      functions.struct(v.as(seg.name))
    }

  /** Index-free deep set that creates missing intermediate structs and
    * replaces non-struct intermediates with fresh ones (jsn:set).
    */
  private def deepSet(parent: Column,
      pt: org.apache.spark.sql.types.DataType, segs: Seq[Seg],
      value: Column): Column = pt match {
    case _: org.apache.spark.sql.types.StructType => segs match {
      case Seq(Seg(name, _)) => parent.withField(s"`$name`", value)
      case Seg(name, _) +: rest =>
        fieldTypeOf(pt, name) match {
          case Some(ft) => parent.withField(s"`$name`",
            deepSet(parent.getField(name), ft, rest, value))
          case None => parent.withField(s"`$name`", fresh(rest, value))
        }
    }
    // a scalar on the path: the whole subtree becomes a fresh struct
    case _ => fresh(segs, value)
  }

  private def fieldTypeOf(t: org.apache.spark.sql.types.DataType,
      name: String): Option[org.apache.spark.sql.types.DataType] = t match {
    case st: org.apache.spark.sql.types.StructType =>
      st.fields.find(_.name == name).map(_.dataType)
    case _ => None
  }

  /** Deep write with array-index support. `guard` carries the accumulated
    * element-index conditions: inside a `transform` every element must
    * take the same SCHEMA (the new field appears everywhere), but only
    * the addressed element takes the VALUE — elements that already carry
    * the field KEEP their existing value (schema threads through `pt` to
    * know which), and elements that never had it get NULL ≈ the
    * reference's absent key.
    */
  private def updated(parent: Column,
      pt: org.apache.spark.sql.types.DataType, segs: Seq[Seg],
      value: Column, guard: Option[Column]): Column =
    segs match {
      case Seq() => value
      case Seq(Seg(name, None)) =>
        val v = guard match {
          case Some(g) if fieldTypeOf(pt, name).isDefined =>
            functions.when(g, value).otherwise(parent.getField(name))
          case Some(g) => functions.when(g, value)
          case None => value
        }
        parent.withField(s"`$name`", v)
      case Seg(name, None) +: rest =>
        parent.withField(s"`$name`",
          updated(parent.getField(name),
            fieldTypeOf(pt, name)
              .getOrElse(org.apache.spark.sql.types.NullType),
            rest, value, guard))
      case Seg(name, Some(i)) +: rest =>
        val elemT = fieldTypeOf(pt, name) match {
          case Some(at: org.apache.spark.sql.types.ArrayType) => at.elementType
          case _ => org.apache.spark.sql.types.NullType
        }
        // jsn list semantics: an index past the end EXTENDS the list
        // with null slots up to i (jsn_tests.erl jsn_set_basic_test:
        // set 'data.bar[2]' on a 1-element list appends) — the same
        // shape fresh() creates for an absent root
        val arr0 = parent.getField(name)
        val pad = functions.array_repeat(
          functions.lit(null).cast(elemT),
          functions.greatest(functions.lit(0),
            functions.lit(i) - functions.size(arr0)))
        val arr = functions.when(functions.size(arr0) < i,
          functions.concat(arr0, pad)).otherwise(arr0)
        parent.withField(s"`$name`",
          functions.transform(arr, (x, j) => {
            val g = guard.map(_ && (j === i - 1)).getOrElse(j === i - 1)
            if (rest.isEmpty) functions.when(g, value).otherwise(x)
            else {
              // a padded (or genuinely null) element must be seeded with
              // a typed all-null struct before the write: withField on a
              // NULL struct stays NULL, but jsn creates the map
              val seeded = elemT match {
                case st: org.apache.spark.sql.types.StructType =>
                  functions.when(x.isNull && g, emptyStruct(st))
                    .otherwise(x)
                case _ => x
              }
              updated(seeded, elemT, rest, value, Some(g))
            }
          }))
    }

  private def emptyStruct(
      st: org.apache.spark.sql.types.StructType): Column =
    functions.struct(st.fields.toIndexedSeq.map(f =>
      functions.lit(null).cast(f.dataType).as(f.name)): _*)

  /** Deep delete of the field at `path`. Array-indexed segments are
    * supported (flowdata's 1-based `bar[1].first` addressing,
    * flowdata_tests.erl rename_field_deep_array_index_test): a
    * tail-position `bar[2]` removes the addressed ELEMENT (the list
    * shrinks, as jsn does); an indexed segment mid-path NULLs the field
    * in the addressed element only — inside a `transform` every element
    * shares one schema, so per-element key REMOVAL is not
    * representable; NULL ≈ the reference's absent key is this engine's
    * documented convention (see [[set]]'s guard note).
    */
  def delete(df: DataFrame, path: String): DataFrame = {
    val segs = parse(path)
    if (segs.forall(_.idx.isEmpty)) deleteSegs(df, segs)
    else {
      require(segs.head.idx.isEmpty,
        s"cannot delete an array-element root: $path")
      val root = segs.head.name
      if (!df.columns.contains(root)) df
      else if (segs.last.idx.isDefined && segs.init.forall(_.idx.isEmpty)) {
        // element removal: rebuild the parent array without slot i
        val i = segs.last.idx.get
        val arrSegs = segs.init :+ segs.last.copy(idx = None)
        val removed =
          functions.filter(strictRef(arrSegs), (_, j) => j =!= i - 1)
        // re-escape literal dots (parse's `*` convention) for the
        // index-free set round-trip
        set(df, arrSegs.map(_.name.replace('.', '*')).mkString("."),
          removed)
      } else
        df.withColumn(root, updated(functions.col(s"`$root`"),
          df.schema(root).dataType, segs.tail, functions.lit(null), None))
    }
  }

  private def deleteSegs(df: DataFrame, segs: Seq[Seg]): DataFrame = {
    if (segs.size == 1) return df.drop(segs.head.name)
    // deleting a struct's LAST field would leave an empty struct — not
    // representable in Spark's type system — so the parent goes with it
    // (the reference keeps an empty map; the nearest relational analog,
    // jpath.dfs `delete .fields('var.val2')` where val2 is var's only key)
    typeAt(df.schema, segs.init) match {
      case Some(st: org.apache.spark.sql.types.StructType)
          if st.fields.length == 1 && st.fields.head.name == segs.last.name =>
        deleteSegs(df, segs.init)
      case _ =>
        val root = segs.head.name
        val rest = segs.tail.map(s => s"`${s.name}`").mkString(".")
        df.withColumn(root, functions.col(s"`$root`").dropFields(rest))
    }
  }

  private def typeAt(schema: org.apache.spark.sql.types.StructType,
      segs: Seq[Seg]): Option[org.apache.spark.sql.types.DataType] =
    segs.foldLeft(
      Option(schema: org.apache.spark.sql.types.DataType)) { (t, seg) =>
      t.flatMap {
        case st: org.apache.spark.sql.types.StructType =>
          st.fields.find(_.name == seg.name).map(_.dataType).map {
            case at: org.apache.spark.sql.types.ArrayType
                if seg.idx.isDefined => at.elementType
            case dt => dt
          }
        case _ => None
      }
    }

  /** Whether the path resolves against the DataFrame's schema. */
  def has(df: DataFrame, path: String): Boolean =
    try { df.select(ref(path)); true }
    catch { case _: org.apache.spark.sql.AnalysisException => false }
}
