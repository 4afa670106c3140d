package graft

import graft.core.Sessions
import graft.operators.text.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Content-defined chunking: coverage/reassembly invariant, boundary
  * rule replay, shift resistance (the property byte-offset chunking
  * lacks), identical-run chunk identity, short-doc passthrough, and
  * partition invariance.
  */
class CdcSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4, "cdc-test")

  private def mkDocs(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def chunks(rows: Seq[(Long, String)], mask: Int = 4) =
    Dedup.cdcChunks(mkDocs(rows), col("text"), col("doc_id"), mask)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("chunk_idx"),
        r.getAs[Int]("n_tok"), r.getAs[String]("digest")))
      .sortBy(t => (t._1, t._2))

  // deterministic many-token text so mask=4 yields several boundaries
  private def words(n: Int, salt: String): String =
    (0 until n).map(i => s"w$salt${(i * 37 + 11) % 97}").mkString(" ")

  test("chunks cover the document: token counts sum, order is dense") {
    val text = words(60, "a")
    val got = chunks(Seq((1L, text)))
    assert(got.map(_._3).sum == 60)
    assert(got.map(_._2).toSeq == got.indices.toSeq)
    assert(got.length > 1, "mask=4 over 60 tokens should cut somewhere")
  }

  test("identical runs produce identical chunk digests across docs") {
    val shared = words(40, "s")
    val got = chunks(Seq((1L, shared), (2L, shared)))
    val byDoc = got.groupBy(_._1).view.mapValues(_.map(_._4).toSeq).toMap
    assert(byDoc(1L) == byDoc(2L))
  }

  test("shift resistance: a head insertion re-syncs within one chunk") {
    val base = words(60, "a")
    val shifted = "zz0 zz1 zz2 " + base
    val a = chunks(Seq((1L, base))).map(_._4).toSet
    val b = chunks(Seq((1L, shifted))).map(_._4).toSet
    // all but the first chunk of `base` should reappear verbatim
    val kept = a.intersect(b).size
    assert(kept >= a.size - 1,
      s"expected >= ${a.size - 1} shared chunks, got $kept")
  }

  test("short docs (< 3 tokens) pass through as one chunk") {
    val got = chunks(Seq((1L, "one two"), (2L, "single"), (3L, "  ")))
    assert(got.count(_._1 == 1L) == 1 && got.find(_._1 == 1L).get._3 == 2)
    assert(got.count(_._1 == 2L) == 1)
    assert(got.count(_._1 == 3L) == 1) // blank -> [""] single token
  }

  test("dup report: planted shared run flags, unique docs at zero") {
    val shared = words(40, "s")
    val rep = Dedup.cdcDupReport(
        mkDocs(Seq((1L, shared + " " + words(30, "x")),
          (2L, shared + " " + words(30, "y")), (3L, words(50, "z")))),
        col("text"), col("doc_id"), 4)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_chunks"), r.getAs[Long]("n_dup"),
          r.getAs[Long]("dup_ppm")))).toMap
    assert(rep(1L)._2 > 0 && rep(2L)._2 > 0,
      s"shared 40-token run must yield dup chunks, got $rep")
    assert(rep(3L)._2 == 0 && rep(3L)._3 == 0)
  }

  test("partition invariance") {
    val rows = (0L until 30L).map(i => (i, words(40 + (i % 13).toInt,
      s"p${i % 3}")))
    val a = chunks(rows)
    val b = Dedup.cdcChunks(mkDocs(rows).repartition(7), col("text"),
        col("doc_id"), 4)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("chunk_idx"),
        r.getAs[Int]("n_tok"), r.getAs[String]("digest")))
      .sortBy(t => (t._1, t._2))
    assert(a.toSeq == b.toSeq)
  }
}
