package graft.web

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** HTML → text extraction: the engine's reference extractor for the webtext
  * path (BASELINE.json input_hint: "byte-identical extracted text per url").
  *
  * Deterministic single-pass state machine over UTF-8 bytes:
  *  - drops <head>…</head>, <script>…</script>, <style>…</style> wholesale;
  *  - drops all other tags;
  *  - decodes the five predeclared entities (&amp; &lt; &gt; &quot; &#39;);
  *  - emits block-level breaks as single spaces and collapses runs of
  *    whitespace to one space, trimmed.
  *
  * Pure JVM function (no Spark dependency) so the identical code generates
  * golden outputs in tests and runs inside the indexing UDF — this is what
  * makes the per-url byte-identity invariant checkable with `sbt test`. */
object HtmlExtract extends Serializable {

  def extract(html: Array[Byte]): String = {
    if (html == null) return ""
    val s = new String(html, java.nio.charset.StandardCharsets.UTF_8)
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    var lastWasSpace = true // leading whitespace suppressed
    def emit(c: Char): Unit = {
      if (c == ' ' || c == '\n' || c == '\t' || c == '\r') {
        if (!lastWasSpace) { out.append(' '); lastWasSpace = true }
      } else { out.append(c); lastWasSpace = false }
    }
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '<') {
        val close = s.indexOf('>', i)
        if (close < 0) { i = s.length } // malformed tail: drop
        else {
          val tag = s.substring(i + 1, close).toLowerCase
          val name = tag.takeWhile(ch => ch.isLetter)
          if (name == "script" || name == "style" || name == "head") {
            val end = s.toLowerCase.indexOf(s"</$name", close)
            i = if (end < 0) s.length
                else s.indexOf('>', end) match { case -1 => s.length; case e => e + 1 }
          } else {
            emit(' ') // tags act as whitespace separators
            i = close + 1
          }
        }
      } else if (c == '&') {
        val known = Seq("&amp;" -> '&', "&lt;" -> '<', "&gt;" -> '>',
          "&quot;" -> '"', "&#39;" -> '\'')
        known.find { case (e, _) => s.startsWith(e, i) } match {
          case Some((e, ch)) => emit(ch); i += e.length
          case None => emit('&'); i += 1
        }
      } else { emit(c); i += 1 }
    }
    // trim the trailing space the final tag may have produced
    val r = out.toString
    if (r.endsWith(" ")) r.substring(0, r.length - 1) else r
  }

  val extractUdf = udf((b: Array[Byte]) => extract(b))

  def extractCol(c: Column): Column = extractUdf(c)
}
