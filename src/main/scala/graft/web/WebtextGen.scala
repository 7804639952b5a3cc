package graft.web

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.model.WebDoc

/** Deterministic synthetic Common-Crawl-style corpus at the BASELINE.json
  * `input_hint` schema: (url string, warc_ts timestamp, html binary,
  * text string, lang string). Seed-42 splitmix64 streams; Zipfian term
  * distribution (exercises the head-term skew path); a small fraction of
  * URLs appears at multiple warc_ts (exercises last-write-wins dedup);
  * ~1% of tokens carry HTML-escapable characters (exercises entity
  * decoding in the extractor).
  *
  * Generated distributedly (spark.range → mapPartitions over ids — datagen
  * is inherently imperative per-row); html is built FROM text so the
  * extractor invariant extract(html) == text is testable per url. */
object WebtextGen {

  val Seed = 42L
  val VocabSize = 10000

  private def mix(x0: Long): Long = {
    var z = x0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private def unit(x: Long): Double = (mix(x) >>> 11).toDouble / (1L << 53).toDouble

  /** Vocabulary: rank-ordered synthetic words; three entity-bearing tokens
    * near the head so escaping is exercised often. */
  def word(rank: Int): String = rank match {
    case 7 => "r&d"
    case 13 => "<tag>"
    // NB: a mid-word double-quote (q"uote) stays ONE token under the JDK
    // BreakIterator — a surrounding-quoted word tokenizes the same under
    // UAX#29 and the oracle's [a-z0-9]+ regexp while still exercising &quot;
    case 23 => "\"w9\""
    case r => s"w$r"
  }

  /** Zipf(s≈1) rank via log-uniform inverse CDF. */
  private def zipfRank(u: Double): Int =
    math.min(VocabSize - 1, math.exp(u * math.log(VocabSize.toDouble)).toInt)

  def textFor(docId: Long): String = {
    val base = Seed ^ (docId * 1000003L)
    val sb = new StringBuilder
    var j = 0
    val n = 50 + (math.abs(mix(base + 1)) % 151).toInt
    while (j < n) {
      if (j > 0) sb.append(' ')
      sb.append(word(zipfRank(unit(base + 10 + j))))
      j += 1
    }
    sb.toString
  }

  /** Single-pass escape into an existing builder (byte-identical to the
    * chained String.replace formulation, which allocated a Pattern+Matcher
    * and an intermediate String per pass — the generator runs once per
    * synthetic doc, so its allocation rate is benchmark-visible). */
  private def escapeInto(sb: java.lang.StringBuilder, s: String): Unit = {
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '&' => sb.append("&amp;")
        case '<' => sb.append("&lt;")
        case '>' => sb.append("&gt;")
        case '"' => sb.append("&quot;")
        case c => sb.append(c)
      }
      i += 1
    }
  }

  /** html wraps the text in 10-token paragraphs with escaped entities plus
    * head/style noise the extractor must drop. Built in one pass over the
    * split(" ", -1) token sequence, so a trailing space (an empty final
    * token) and the empty text (one empty token → one empty paragraph) both
    * produce well-formed paragraphs. */
  def htmlFor(docId: Long, text: String): Array[Byte] = {
    val sb = new java.lang.StringBuilder(text.length * 2 + 160)
    sb.append("<html><head><title>doc ").append(docId).append("</title>")
      .append("<style>p { color: #000; }</style>")
      .append("<script>var x = 1 < 2;</script></head><body>")
    // paragraphs of 10 space-separated tokens, escaped inline
    var i = 0
    var tok = 0
    val n = text.length
    var done = false
    while (!done) {
      if (tok % 10 == 0) sb.append("<p class=\"x\">")
      val end = { val e = text.indexOf(' ', i); if (e < 0) n else e }
      escapeInto(sb, text.substring(i, end))
      tok += 1
      done = end >= n // the token ending at n is the last, even if empty
      if (tok % 10 == 0 || done) sb.append("</p>") else sb.append(' ')
      i = end + 1
    }
    sb.append("</body></html>")
    sb.toString.getBytes("UTF-8")
  }

  val Langs = Array("en", "en", "en", "de", "es", "fr", "zh")

  /** ~10% of rows re-crawl an earlier url at a later warc_ts (same id space)
    * with different content — last-write-wins must keep the later row. */
  def urlFor(docId: Long, nDocs: Long): String = {
    val recrawl = unit(Seed ^ docId * 31L) < 0.1 && docId >= nDocs / 2
    val target = if (recrawl) docId % (nDocs / 2) else docId
    s"https://host${target % 1000}.example/p$target"
  }

  def rowFor(docId: Long, nDocs: Long): WebDoc = {
    val text = textFor(docId)
    WebDoc(
      url = urlFor(docId, nDocs),
      warc_ts = new Timestamp(1704067200000L + docId * 1000L),
      html = htmlFor(docId, text),
      text = text,
      lang = Langs((math.abs(mix(Seed ^ (docId * 77L))) % Langs.length).toInt))
  }

  def generate(spark: SparkSession, nDocs: Long,
               partitions: Int = 64): Dataset[WebDoc] = {
    import spark.implicits._
    spark.range(0L, nDocs, 1L, partitions)
      .mapPartitions(_.map(i => rowFor(i, nDocs)))
  }

  def generateDf(spark: SparkSession, nDocs: Long, partitions: Int = 64): DataFrame =
    generate(spark, nDocs, partitions).toDF()
}
