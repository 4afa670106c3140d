package graft.io

/** Engine-side PLC request PLANNING — the half of `s7read` / `modbus`
  * that is pure logic, pinned by the reference's own eunit suites: parse
  * symbolic addresses, partition by data type, and coalesce adjacent
  * registers into bulk reads so one wire round-trip serves a contiguous
  * run. The byte-level clients stay deployment-side (README connector
  * boundary); a client binding takes these parts verbatim.
  *
  * Refs: esp_s7read.erl:356-468 (build_addresses / find_bool_bytes /
  * find_contiguous / word_len_size, eunit build_addresses_test),
  * esp_modbus_read.erl:268-293 (find_contiguous, eunit
  * build_find_contiguous_test).
  */
object PlcPlan {

  // ------------------------------------------------------------------ S7

  /** One parsed S7 symbolic address. For `bool` (DBX) the `start` is the
    * BIT offset (byte*8 + bit, the s7addr convention the byte_num/bit_num
    * split in esp_s7read.erl:364-368 implies); for `string` (DBS) the
    * trailing segment is the byte length, landing in `amount`.
    */
  final case class S7Address(dbNumber: Int, dtype: String, start: Int,
    amount: Int)

  /** One coalesced read request (esp_s7read's address partition map). */
  final case class S7Part(area: String, dbNumber: Int, start: Int,
    amount: Int, wordLen: String)

  /** Per-part alias mapping: for bool-byte parts `kinds` is "bool_byte"
    * per alias and `bits` the bit index RELATIVE to the part's first
    * byte (esp_s7read.erl:398 `Bit+(Byte-CStartByte)*8`); for non-bool
    * parts `kinds` is the dtype and `bits` is empty.
    */
  final case class S7Aliases(aliases: Seq[String], kinds: Seq[String],
    bits: Seq[Int])

  private val S7Re = """(?i)DB(\d+)\.DB([XWBDS])(\d+)(?:\.(\d+))?""".r
  // the comma form the reference scripts also use: DB4,DInt22 / DB4,R1
  private val S7CommaRe = """DB(\d+),([A-Za-z]+?)(\d+)(?:\.(\d+))?""".r

  private val dtypeOf = Map("X" -> "bool", "B" -> "byte", "W" -> "word",
    "D" -> "d_word", "S" -> "string")

  private val commaDtypeOf = Map("x" -> "bool", "b" -> "byte",
    "byte" -> "byte", "w" -> "word", "word" -> "word", "dword" -> "d_word",
    "int" -> "int", "dint" -> "d_int", "r" -> "float", "real" -> "float",
    "s" -> "string", "string" -> "string", "char" -> "char",
    "sint" -> "sint", "usint" -> "usint", "timer" -> "timer",
    "counter" -> "counter")

  /** esp_s7read.erl:456-468 word_len_size. */
  def wordLenSize(dtype: String): Int = dtype match {
    case "bool" | "byte" | "sint" | "usint" | "char" | "string" | "int" => 1
    case "word" => 2
    case "d_word" | "d_int" | "float" | "timer" | "counter" => 4
    case other => throw new IllegalArgumentException(s"s7 dtype: $other")
  }

  /** Parse one address; None = invalid (the reference's
    * `s7addr:parse == {error, invalid}` plan-time reject).
    */
  def parseS7(addr: String, byteOffset: Int = 0): Option[S7Address] = {
    def build(db: String, dtype: String, start: String, sub: Option[String]) =
      (dtype, sub) match {
        case ("bool", Some(bit)) =>
          Some(S7Address(db.toInt, "bool",
            (start.toInt + byteOffset) * 8 + bit.toInt, 1))
        case ("bool", None) => None // a bit address needs its bit
        case ("string", len) =>
          Some(S7Address(db.toInt, "string", start.toInt + byteOffset,
            len.map(_.toInt).getOrElse(1)))
        case (dt, None) =>
          Some(S7Address(db.toInt, dt, start.toInt + byteOffset, 1))
        case (_, Some(_)) => None // only bits/strings take a suffix
      }
    try addr match {
      case S7Re(db, t, start, sub) =>
        build(db, dtypeOf(t.toUpperCase), start, Option(sub))
      case S7CommaRe(db, t, start, sub) =>
        commaDtypeOf.get(t.toLowerCase)
          .flatMap(dt => build(db, dt, start, Option(sub)))
      case _ => None
    } catch { // numerically absurd db/start/bit: invalid, not a crash
      case _: NumberFormatException => None
    }
  }

  /** esp_s7read.erl build_addresses: bools coalesce into byte RUNS (same
    * byte, or the next byte entered at bit 0); non-bools group per dtype
    * (dtype name order) and coalesce when the next start is exactly
    * word_len_size further. Output order is bug-for-bug the reference's:
    * bool parts in run order, then non-bool parts with the LAST fold
    * partition first (find_contiguous returns `[Current|Parts]`).
    */
  def buildS7(addresses: Seq[S7Address], aliases: Seq[String])
      : (Seq[S7Part], Seq[S7Aliases]) = {
    require(addresses.size == aliases.size, "addresses/aliases arity")
    val withAs = addresses.zip(aliases)
    val (bools, nonBools) = withAs.partition(_._1.dtype == "bool")

    // ---- bool bytes (esp_s7read.erl:390-423 find_bool_bytes); the sort
    // key is the reference's db*10000 + start verbatim (:427-433) —
    // including its collision quirk past bit-start 10000
    val boolsSorted = bools.sortBy { case (a, _) =>
      a.dbNumber.toLong * 10000L + a.start
    }
    final case class BoolRun(db: Int, startByte: Int, lastByte: Int,
      amount: Int, aliases: Seq[(String, Int)])
    val boolRuns = boolsSorted.foldLeft(Vector.empty[BoolRun]) {
      case (runs, (a, as)) =>
        val byte = a.start / 8
        val bit = a.start % 8
        runs.lastOption match {
          case Some(r) if r.db == a.dbNumber &&
              (byte == r.lastByte || (byte == r.lastByte + 1 && bit == 0)) =>
            val grown = if (byte == r.lastByte + 1) r.amount + 1 else r.amount
            runs.init :+ r.copy(lastByte = byte, amount = grown,
              aliases = r.aliases :+ (as -> (bit + (byte - r.startByte) * 8)))
          case _ =>
            runs :+ BoolRun(a.dbNumber, byte, byte, 1, Seq(as -> bit))
        }
    }
    val boolParts = boolRuns.map(r =>
      S7Part("db", r.db, r.startByte, r.amount, "byte"))
    val boolAliases = boolRuns.map(r => S7Aliases(r.aliases.map(_._1),
      r.aliases.map(_ => "bool_byte"), r.aliases.map(_._2)))

    // ---- non-bools (esp_s7read.erl:427-455): per-dtype sort, dtype name
    // order (Erlang atom order), fold with the last partition emitted
    // first
    val sorted = nonBools.groupBy(_._1.dtype).toSeq.sortBy(_._1)
      .flatMap { case (_, g) =>
        g.sortBy { case (a, _) => (a.dbNumber.toLong * 10000L) + a.start }
      }
    final case class Run(db: Int, dtype: String, start: Int, last: Int,
      amount: Int, aliases: Seq[String])
    val runs = sorted.foldLeft(Vector.empty[Run]) {
      case (rs, (a, as)) =>
        rs.lastOption match {
          case Some(r) if r.dtype == a.dtype && r.db == a.dbNumber &&
              r.last + wordLenSize(a.dtype) == a.start =>
            rs.init :+ r.copy(last = a.start, amount = r.amount + 1,
              aliases = r.aliases :+ as)
          case _ =>
            rs :+ Run(a.dbNumber, a.dtype, a.start, a.start, a.amount,
              Seq(as))
        }
    }
    val ordered = if (runs.isEmpty) runs else runs.last +: runs.init
    val nbParts = ordered.map { r =>
      val wl = if (r.dtype == "string") "byte" else r.dtype
      S7Part("db", r.db, r.start, r.amount, wl)
    }
    val nbAliases = ordered.map(r =>
      S7Aliases(r.aliases, r.aliases.map(_ => r.dtype), Nil))

    (boolParts ++ nbParts, boolAliases ++ nbAliases)
  }

  // -------------------------------------------------------------- Modbus

  final case class ModbusReq(alias: String, function: String, start: Int,
    amount: Int, opts: String)

  /** One coalesced modbus read: `count` requests merged, `amount` =
    * count × per-request amount (uniform amounts, the reference's
    * assumption at esp_modbus_read.erl:281).
    */
  final case class ModbusPart(alias: String, aliases: Seq[String],
    function: String, start: Int, amount: Int, count: Int, opts: String)

  /** esp_modbus_read.erl:274-293 find_contiguous over start-sorted
    * requests: merge when function AND opts match and the previous start
    * + amount lands exactly on this start. Output order is the
    * reference's `[Current|Parts]` — last partition first.
    */
  def findContiguousModbus(reqs: Seq[ModbusReq]): Seq[ModbusPart] = {
    val sorted = reqs.sortBy(_.start)
    // the merge gate is the reference's verbatim (:279): PREVIOUS
    // request's start + the INCOMING request's amount == incoming start
    // (not part-start + accumulated amount — the two differ for
    // non-uniform amounts, where the reference's arithmetic is the
    // contract a client binding pairs with)
    val (parts, _) = sorted.foldLeft(
      (Vector.empty[ModbusPart], -1)) {
      case ((ps, lastStart), r) =>
        ps.lastOption match {
          case Some(p) if p.function == r.function && p.opts == r.opts &&
              lastStart + r.amount == r.start =>
            (ps.init :+ p.copy(aliases = p.aliases :+ r.alias,
              count = p.count + 1, amount = (p.count + 1) * r.amount),
              r.start)
          case _ =>
            (ps :+ ModbusPart(r.alias, Seq(r.alias), r.function, r.start,
              r.amount, 1, r.opts), r.start)
        }
    }
    if (parts.isEmpty) parts else parts.last +: parts.init
  }
}
