package graft.io

import graft.core.Paths
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The `email` node's string templating + message assembly as pure
  * Column logic (ref: esp_email.erl:115-137 — subject/body are
  * `string_template`s evaluated per point, the HTML template file has its
  * `##PREHEADER##`/`##CONTENT##` markers replaced with the rendered
  * content and `##DEVICE##` with flow@device at init).
  *
  * `{{field.path}}` placeholders resolve against the row (deep paths via
  * Paths.ref); null fields render empty, the flowdata default. Assembly
  * is one codegen'd projection per row — the SMTP client itself is
  * deployment-side (README connector boundary).
  */
object EmailFormat {

  private val Placeholder = "\\{\\{\\s*([^}]+?)\\s*\\}\\}".r

  /** Render a `string_template`: literal segments + field references. */
  def template(tpl: String): Column = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[Column]
    var last = 0
    Placeholder.findAllMatchIn(tpl).foreach { m =>
      if (m.start > last) parts += lit(tpl.substring(last, m.start))
      // the reference also writes quoted refs: {{"body_string"}}
      // (email_param.dfs) — strip the quotes
      val path = m.group(1).stripPrefix("\"").stripSuffix("\"")
        .stripPrefix("'").stripSuffix("'")
      parts += coalesce(Paths.ref(path).cast("string"), lit(""))
      last = m.end
    }
    if (last < tpl.length) parts += lit(tpl.substring(last))
    if (parts.isEmpty) lit("") else concat(parts.toSeq: _*)
  }

  /** Wrap rendered content into the HTML template: every
    * `##PREHEADER##`/`##CONTENT##` marker becomes the content column
    * (esp_email.erl:115-117 binary:replace global).
    */
  def wrapTemplate(templateHtml: String, content: Column): Column = {
    val segs = templateHtml.split("##PREHEADER##|##CONTENT##", -1)
    val parts = segs.zipWithIndex.flatMap { case (s, i) =>
      if (i == 0) Seq(lit(s)) else Seq(content, lit(s))
    }
    if (parts.length == 1) parts.head else concat(parts.toIndexedSeq: _*)
  }

  /** Minimal text/html message with the reference's header set
    * (esp_email.erl:129-137 mime — full MIME encoding is the SMTP
    * client's concern; the engine-visible contract is headers + body).
    */
  def message(from: String, to: Seq[String], subject: Column,
      body: Column): Column =
    concat(
      lit("Subject: "), subject,
      lit(s"\r\nFrom: $from\r\nTo: ${to.mkString(",")}" +
        "\r\nContent-Type: text/html\r\n\r\n"),
      body)
}
