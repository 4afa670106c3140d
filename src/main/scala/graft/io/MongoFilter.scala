package graft.io

import graft.core.Paths
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** MongoDB find-selector → Catalyst predicate (ref: esp_mongo_query.erl:
  * 40-62 — the node's `.query` is a JSON selector validated as a map;
  * the mongo client is deployment-side, the SELECTOR SEMANTICS are
  * engine-side). Supported: implicit equality, $eq/$ne/$gt/$gte/$lt/
  * $lte/$in/$nin/$exists, and $and/$or/$nor combinators — the translated
  * predicate is ordinary Column logic, so it pushes down into the scan
  * like any relational filter.
  */
object MongoFilter {

  import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
  import scala.jdk.CollectionConverters._

  private val mapper = new ObjectMapper()

  /** Translate a JSON selector; `{}` selects everything. */
  def column(json: String): Column = {
    val root = mapper.readTree(json)
    require(root.isObject, s"mongo selector must be an object: $json")
    obj(root)
  }

  private def obj(n: JsonNode): Column = {
    val conds = n.properties().asScala.toSeq.map { e =>
      (e.getKey, e.getValue) match {
        case ("$and", v) => v.elements().asScala.map(obj).reduce(_ && _)
        case ("$or", v) => v.elements().asScala.map(obj).reduce(_ || _)
        case ("$nor", v) => !v.elements().asScala.map(obj).reduce(_ || _)
        case (field, v) => fieldCond(field, v)
      }
    }
    if (conds.isEmpty) lit(true) else conds.reduce(_ && _)
  }

  private def fieldCond(field: String, v: JsonNode): Column = {
    val ref = Paths.ref(field)
    if (v.isObject && v.fieldNames().asScala.exists(_.startsWith("$")))
      v.properties().asScala.toSeq.map { e =>
        (e.getKey, e.getValue) match {
          // null-safe =: {"f": null} matches null-or-absent in Mongo
          case ("$eq", x) => ref <=> litOf(x)
          case ("$ne", x) => !(ref <=> litOf(x)) // mongo $ne matches null
          case ("$gt", x) => ref > litOf(x)
          case ("$gte", x) => ref >= litOf(x)
          case ("$lt", x) => ref < litOf(x)
          case ("$lte", x) => ref <= litOf(x)
          case ("$in", x) =>
            val vs = x.elements().asScala.toSeq.map(rawOf)
            val base = ref.isin(vs.filter(_ != null): _*)
            // a null element makes $in match null/absent fields too
            if (vs.contains(null)) base || ref.isNull else base
          case ("$nin", x) =>
            val vs = x.elements().asScala.toSeq.map(rawOf)
            val base = !ref.isin(vs.filter(_ != null): _*)
            // $nin with a null element excludes null/absent fields;
            // without one, null/absent fields DO match (not in the list)
            if (vs.contains(null)) base && ref.isNotNull
            else base || ref.isNull
          case ("$exists", x) =>
            if (x.asBoolean()) ref.isNotNull else ref.isNull
          case (op, _) =>
            throw new IllegalArgumentException(s"unsupported operator $op")
        }
      }.reduce(_ && _)
    else ref <=> litOf(v) // null-safe: {"f": null} = null-or-absent
  }

  private def rawOf(n: JsonNode): Any =
    if (n.isTextual) n.asText()
    else if (n.isIntegralNumber) n.asLong()
    else if (n.isNumber) n.asDouble()
    else if (n.isBoolean) n.asBoolean()
    else if (n.isNull) null
    else throw new IllegalArgumentException(s"unsupported literal $n")

  private def litOf(n: JsonNode): Column = lit(rawOf(n))
}
