package graft.web

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HTML → text extraction: the engine's reference extractor for the webtext
  * path (BASELINE.json input_hint: "byte-identical extracted text per url").
  *
  * Deterministic single-pass state machine:
  *  - drops <head>…</head>, <script>…</script>, <style>…</style> wholesale;
  *  - drops all other tags (a tag acts as a whitespace separator);
  *  - decodes the five predeclared entities (&amp; &lt; &gt; &quot; &#39;);
  *  - collapses runs of whitespace to one space, trimmed.
  *
  * Pure JVM function (no Spark dependency) so the identical code generates
  * golden outputs in tests and runs inside the indexing expression — this is
  * what makes the per-url byte-identity invariant checkable with `sbt test`.
  *
  * Allocation discipline: the extractor runs once per crawled page — at
  * 10^12 docs it is one of the two hottest loops in the engine — so the scan
  * makes NO allocations beyond the output builder (tag names are matched
  * in place with regionMatches, entities against static arrays; ASCII
  * case-insensitive, matching the previous lowercase formulation on every
  * input the generator/spec corpus can produce). */
object HtmlExtract extends Serializable {

  private val Specials = Array("script", "style", "head")
  private val EntNames = Array("&amp;", "&lt;", "&gt;", "&quot;", "&#39;")
  private val EntChars = Array('&', '<', '>', '"', '\'')

  /** index of case-insensitive "</name" in s at/after from, or -1. */
  private def closeTagIndex(s: String, name: String, from: Int): Int = {
    val limit = s.length - name.length - 2
    var i = from
    while (i <= limit) {
      if (s.charAt(i) == '<' && s.charAt(i + 1) == '/' &&
          s.regionMatches(true, i + 2, name, 0, name.length)) return i
      i += 1
    }
    -1
  }

  def extract(html: Array[Byte]): String = {
    if (html == null) return ""
    val s = new String(html, java.nio.charset.StandardCharsets.UTF_8)
    val len = s.length
    val out = new java.lang.StringBuilder(len)
    var i = 0
    var lastWasSpace = true // leading whitespace suppressed
    def emit(c: Char): Unit = {
      if (c == ' ' || c == '\n' || c == '\t' || c == '\r') {
        if (!lastWasSpace) { out.append(' '); lastWasSpace = true }
      } else { out.append(c); lastWasSpace = false }
    }
    while (i < len) {
      val c = s.charAt(i)
      if (c == '<') {
        val close = s.indexOf('>', i)
        if (close < 0) { i = len } // malformed tail: drop
        else {
          // letter-prefix length of the tag content, matched in place
          var p = i + 1
          while (p < close && Character.isLetter(s.charAt(p))) p += 1
          val nameLen = p - (i + 1)
          var special: String = null
          var k = 0
          while (k < Specials.length && special == null) {
            val sp = Specials(k)
            if (nameLen == sp.length &&
                s.regionMatches(true, i + 1, sp, 0, nameLen)) special = sp
            k += 1
          }
          if (special != null) {
            val end = closeTagIndex(s, special, close)
            i = if (end < 0) len
                else s.indexOf('>', end) match { case -1 => len; case e => e + 1 }
          } else {
            emit(' ') // tags act as whitespace separators
            i = close + 1
          }
        }
      } else if (c == '&') {
        var hit = -1
        var k = 0
        while (k < EntNames.length && hit < 0) {
          if (s.startsWith(EntNames(k), i)) hit = k
          k += 1
        }
        if (hit >= 0) { emit(EntChars(hit)); i += EntNames(hit).length }
        else { emit('&'); i += 1 }
      } else { emit(c); i += 1 }
    }
    // trim the trailing space the final tag may have produced
    val last = out.length - 1
    if (last >= 0 && out.charAt(last) == ' ') out.setLength(last)
    out.toString
  }

  /** Static entry the generated code calls. */
  def extractU(b: Array[Byte]): UTF8String = UTF8String.fromString(extract(b))

  def extractCol(c: Column): Column =
    Bridge.column(ExtractExpr(Bridge.expression(c)))
}

/** Native codegen expression for the extractor (binary → string): stays
  * inside whole-stage codegen instead of the UDF's closure boundary. */
case class ExtractExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_extract requires a binary argument, got ${child.dataType}")

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_extract"

  override def nullSafeEval(input: Any): Any =
    HtmlExtract.extractU(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.web.HtmlExtract.extractU($c)")

  override protected def withNewChildInternal(newChild: Expression): ExtractExpr =
    copy(child = newChild)
}
