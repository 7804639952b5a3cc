package graft.analysis

import java.text.{BreakIterator, Normalizer}
import java.util.Locale
import scala.collection.mutable.ArrayBuffer

/** The engine's analysis chain — the "reference extractor" for the per-url
  * byte-identity invariant (BASELINE.json `input_hint`).
  *
  * Re-expresses the Elasticsearch analyzer spec declared in the reference at
  * `elastic/settings.go:56-84` (four analyzers built from: keyword or standard
  * tokenizer, lowercase, asciifolding, `_english_` stopwords) as deterministic,
  * JVM-stable Scala:
  *
  *  - tokenizer: UAX#29-style word segmentation via
  *    `java.text.BreakIterator.getWordInstance(Locale.ROOT)`, keeping tokens
  *    that contain a letter or digit (the Lucene `standard` tokenizer contract,
  *    public behavior);
  *  - lowercase: `String.toLowerCase(Locale.ROOT)` per token (Lucene
  *    `lowercase` token filter);
  *  - asciifolding: NFD normalize + strip combining marks (documented subset of
  *    Lucene's ASCIIFoldingFilter — covers Latin diacritics);
  *  - stopwords: the public Lucene `_english_` 33-word set (reference
  *    `elastic/settings.go:57-62` configures `"stopwords": "_english_"`).
  *
  * Pure functions, no Spark dependency — the exact same code generates golden
  * test outputs and runs inside Spark UDFs/kernels, which is what makes
  * "byte-identical extracted text per url" checkable with `sbt -batch test`.
  */
object Analyzer extends Serializable {

  /** Lucene `_english_` stopword set (public). */
  val EnglishStop: Set[String] = Set(
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if", "in",
    "into", "is", "it", "no", "not", "of", "on", "or", "such", "that", "the",
    "their", "then", "there", "these", "they", "this", "to", "was", "will",
    "with")

  /** Stable, sorted form for embedding in oracle SQL IN-lists. */
  val EnglishStopSorted: Seq[String] = EnglishStop.toSeq.sorted

  /** Per-thread BreakIterator (stateful, not thread-safe; constructing one
    * per call shows up at corpus scale). */
  private val biCache: ThreadLocal[BreakIterator] =
    ThreadLocal.withInitial(() => BreakIterator.getWordInstance(Locale.ROOT))

  /** UAX#29 word segmentation; keep tokens containing a letter/digit. */
  def tokenize(text: String): Array[String] = {
    if (text == null || text.isEmpty) return Array.empty[String]
    val bi = biCache.get()
    bi.setText(text)
    val out = new ArrayBuffer[String](16)
    var start = bi.first()
    var end = bi.next()
    while (end != BreakIterator.DONE) {
      var hasAlnum = false
      var i = start
      while (i < end && !hasAlnum) {
        val cp = text.codePointAt(i)
        if (Character.isLetterOrDigit(cp)) hasAlnum = true
        i += Character.charCount(cp)
      }
      if (hasAlnum) out += text.substring(start, end)
      start = end
      end = bi.next()
    }
    out.toArray
  }

  private def isCombiningMark(cp: Int): Boolean = {
    val t = Character.getType(cp)
    t == Character.NON_SPACING_MARK || t == Character.COMBINING_SPACING_MARK ||
    t == Character.ENCLOSING_MARK
  }

  /** ASCII folding: NFD-decompose then drop combining marks ("Åström"→"Astrom").
    * ASCII fast path keeps the hot loop allocation-free. */
  def fold(s: String): String = {
    var ascii = true
    var i = 0
    while (ascii && i < s.length) { if (s.charAt(i) >= 0x80) ascii = false; i += 1 }
    if (ascii) return s
    val d = Normalizer.normalize(s, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(d.length)
    var j = 0
    while (j < d.length) {
      val cp = d.codePointAt(j)
      if (!isCombiningMark(cp)) sb.appendCodePoint(cp)
      j += Character.charCount(cp)
    }
    sb.toString
  }

  /** `case_insensitive_folding_text` chain (reference settings.go:74-78):
    * standard tokenize → lowercase → asciifold. */
  def analyze(text: String): Array[String] =
    tokenize(text).map(t => fold(t.toLowerCase(Locale.ROOT)))

  /** `case_insensitive_folding_text_stopwords` chain (settings.go:79-83):
    * standard tokenize → lowercase → asciifold → `_english_` stop filter.
    * Single fused pass (identical output to `analyze(_).filterNot(stop)`). */
  def analyzeStop(text: String): Array[String] = {
    val toks = tokenize(text)
    val out = new ArrayBuffer[String](toks.length)
    var i = 0
    while (i < toks.length) {
      val t = fold(toks(i).toLowerCase(Locale.ROOT))
      if (!EnglishStop.contains(t)) out += t
      i += 1
    }
    out.toArray
  }

  /** Fused tokenize → lowercase → fold → stop → count, used by the per-doc
    * tf kernel (AnalyzeTfExpr): identical result to
    * `analyzeStop(text)` + occurrence counting (KernelSpec property), with
    * ~one allocation per kept token — pure-ASCII tokens lowercase directly
    * into a char buffer ('A'-'Z'+32 ≡ String.toLowerCase(ROOT) for ASCII,
    * fold is the identity); anything else takes the reference path.
    * Returns (dl = kept-token count, term → tf sorted map). */
  def analyzeStopCounts(text: String): (Int, java.util.TreeMap[String, Int]) = {
    val counts = new java.util.TreeMap[String, Int]()
    (countInto(text, EnglishStop, counts), counts)
  }

  /** The fused counting loop, adding into an existing map (so multi-valued
    * fields accumulate one token stream across values, the ES array
    * semantics). Returns the number of kept tokens added. */
  private[analysis] def countInto(text: String, stop: Set[String],
      counts: java.util.TreeMap[String, Int]): Int = {
    if (text == null || text.isEmpty) return 0
    val bi = biCache.get()
    bi.setText(text)
    var dl = 0
    var start = bi.first()
    var end = bi.next()
    while (end != BreakIterator.DONE) {
      var hasAlnum = false
      var i = start
      while (i < end && !hasAlnum) {
        val cp = text.codePointAt(i)
        if (Character.isLetterOrDigit(cp)) hasAlnum = true
        i += Character.charCount(cp)
      }
      if (hasAlnum) {
        var ascii = true
        var j = start
        while (ascii && j < end) { if (text.charAt(j) >= 0x80) ascii = false; j += 1 }
        val tok =
          if (ascii) {
            val arr = new Array[Char](end - start)
            var k = start
            var m = 0
            while (k < end) {
              val c = text.charAt(k)
              arr(m) = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
              k += 1; m += 1
            }
            new String(arr)
          } else fold(text.substring(start, end).toLowerCase(Locale.ROOT))
        if (!stop.contains(tok)) {
          dl += 1
          counts.merge(tok, 1, (a, b) => a + b)
        }
      }
      start = end
      end = bi.next()
    }
    dl
  }

  /** `case_insensitive_keyword` chain (settings.go:64-68): whole string is one
    * token, lowercased. */
  def analyzeKeyword(text: String): String =
    if (text == null) null else text.toLowerCase(Locale.ROOT)

  /** `case_insensitive_folding_keyword` chain (settings.go:69-73). */
  def analyzeKeywordFold(text: String): String =
    if (text == null) null else fold(text.toLowerCase(Locale.ROOT))

  // ---- Chain registry (the reference's four analyzers, settings.go:63-84,
  // addressable by id so field mappings are plain data) --------------------

  val Keyword = "keyword" //             keyword tokenizer + lowercase
  val KeywordFold = "keyword_fold" //    keyword + lowercase + asciifolding
  val Text = "text" //                   standard + lowercase + asciifolding
  val TextStop = "text_stop" //          text + `_english_` stop filter
  val Chains: Set[String] = Set(Keyword, KeywordFold, Text, TextStop)

  /** Query-side analysis under a chain: the token stream a query string
    * produces against a field indexed with that chain (rank-identity
    * precondition — same function both sides). Keyword chains yield the
    * whole string as one token; empty/null yields none. */
  def analyzeChain(kind: String, q: String): Array[String] = kind match {
    case Keyword =>
      if (q == null || q.isEmpty) Array.empty else Array(analyzeKeyword(q))
    case KeywordFold =>
      if (q == null || q.isEmpty) Array.empty else Array(analyzeKeywordFold(q))
    case Text => analyze(q)
    case TextStop => analyzeStop(q)
    case other => throw new IllegalArgumentException(s"unknown analyzer chain: $other")
  }

  // ---- positions (phrase tier) ------------------------------------------

  /** ES `position_increment_gap` default for multi-valued text fields
    * (public Lucene/ES behavior): the first token of value v+1 sits at
    * (last position of value v) + gap + 1, so phrases can never match
    * across value boundaries. */
  val PositionIncrementGap = 100

  /** Per-term accumulator: tf + token positions (strictly increasing). */
  final class TermAcc {
    var tf = 0
    var pos: Array[Int] = new Array[Int](4)
    def add(p: Int): Unit = {
      if (tf == pos.length) pos = java.util.Arrays.copyOf(pos, pos.length * 2)
      pos(tf) = p
      tf += 1
    }
    def positions: Array[Int] = java.util.Arrays.copyOf(pos, tf)
  }

  /** The fused counting loop WITH positions: position = index in the
    * TOKENIZER's stream (offset + seen), so a removed stopword leaves a
    * gap — Lucene's StopFilter preserves position increments, which is
    * what makes `match_phrase` refuse to bridge a dropped stopword.
    * Returns (keptTokens, seenTokens). */
  private[analysis] def countPosInto(text: String, stop: Set[String],
      accs: java.util.TreeMap[String, TermAcc], offset: Int): (Int, Int) = {
    if (text == null || text.isEmpty) return (0, 0)
    val bi = biCache.get()
    bi.setText(text)
    var kept = 0
    var seen = 0
    var start = bi.first()
    var end = bi.next()
    while (end != BreakIterator.DONE) {
      var hasAlnum = false
      var i = start
      while (i < end && !hasAlnum) {
        val cp = text.codePointAt(i)
        if (Character.isLetterOrDigit(cp)) hasAlnum = true
        i += Character.charCount(cp)
      }
      if (hasAlnum) {
        // same ASCII fast path as countInto: pure-ASCII tokens lowercase
        // straight into a char buffer ('A'-'Z'+32 ≡ toLowerCase(ROOT) for
        // ASCII; fold is the identity) — the per-token substring +
        // toLowerCase + NFD probe otherwise dominates the analyze kernel
        var ascii = true
        var j = start
        while (ascii && j < end) { if (text.charAt(j) >= 0x80) ascii = false; j += 1 }
        val tok =
          if (ascii) {
            val arr = new Array[Char](end - start)
            var k = start
            var m = 0
            while (k < end) {
              val c = text.charAt(k)
              arr(m) = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
              k += 1; m += 1
            }
            new String(arr)
          } else fold(text.substring(start, end).toLowerCase(Locale.ROOT))
        if (!stop.contains(tok)) {
          kept += 1
          accs.computeIfAbsent(tok, _ => new TermAcc).add(offset + seen)
        }
        seen += 1 // stopwords advance the position too (increment kept)
      }
      start = end
      end = bi.next()
    }
    (kept, seen)
  }

  /** Index-side counting WITH positions under a chain over a multi-valued
    * field — the phrase-tier twin of [[chainCounts]] (same dl/tf numbers,
    * AnalyzerSpec-pinned). Text chains: tokenizer-indexed positions with
    * stopword gaps and the multi-value [[PositionIncrementGap]]; keyword
    * chains: one position per kept value (ES keyword fields store no
    * positions — harmless parity-plus here, a phrase over one keyword
    * token degenerates to a term query). Returns (dl, term→acc). */
  def chainCountsPos(kind: String, values: Iterator[String])
      : (Int, java.util.TreeMap[String, TermAcc]) = {
    val accs = new java.util.TreeMap[String, TermAcc]()
    var dl = 0
    var offset = 0
    kind match {
      case Keyword | KeywordFold =>
        val doFold = kind == KeywordFold
        values.foreach { v =>
          if (v != null && v.nonEmpty) {
            val tok = if (doFold) analyzeKeywordFold(v) else analyzeKeyword(v)
            accs.computeIfAbsent(tok, _ => new TermAcc).add(offset)
            dl += 1
            offset += 1
          }
        }
      case Text | TextStop =>
        val stop = if (kind == TextStop) EnglishStop else Set.empty[String]
        values.foreach { v =>
          val (kept, seen) = countPosInto(v, stop, accs, offset)
          dl += kept
          offset += seen + PositionIncrementGap
        }
      case other =>
        throw new IllegalArgumentException(s"unknown analyzer chain: $other")
    }
    (dl, accs)
  }

  /** Query-side analysis WITH positions (the match_phrase query's token
    * stream): same tokenizer indices as the index side, so a stopword in
    * the phrase leaves the same gap it left in the document. */
  def analyzeChainPos(kind: String, q: String): Array[(String, Int)] =
    kind match {
      case Keyword =>
        if (q == null || q.isEmpty) Array.empty
        else Array((analyzeKeyword(q), 0))
      case KeywordFold =>
        if (q == null || q.isEmpty) Array.empty
        else Array((analyzeKeywordFold(q), 0))
      case Text | TextStop =>
        val stop = if (kind == TextStop) EnglishStop else Set.empty[String]
        val out = new ArrayBuffer[(String, Int)](8)
        val toks = tokenize(q)
        var i = 0
        while (i < toks.length) {
          val tok = fold(toks(i).toLowerCase(Locale.ROOT))
          if (!stop.contains(tok)) out += ((tok, i))
          i += 1
        }
        out.toArray
      case other =>
        throw new IllegalArgumentException(s"unknown analyzer chain: $other")
    }

  /** Index-side counting under a chain over a MULTI-VALUED field (ES array
    * semantics: values concatenate into one token stream; for keyword
    * chains each non-empty value is one token). Returns (dl, term→tf). */
  def chainCounts(kind: String, values: Iterator[String])
      : (Int, java.util.TreeMap[String, Int]) = {
    val counts = new java.util.TreeMap[String, Int]()
    var dl = 0
    kind match {
      case Keyword | KeywordFold =>
        val fold = kind == KeywordFold
        values.foreach { v =>
          if (v != null && v.nonEmpty) {
            val tok = if (fold) analyzeKeywordFold(v) else analyzeKeyword(v)
            counts.merge(tok, 1, (a, b) => a + b)
            dl += 1
          }
        }
      case Text =>
        values.foreach(v => dl += countInto(v, Set.empty, counts))
      case TextStop =>
        values.foreach(v => dl += countInto(v, EnglishStop, counts))
      case other =>
        throw new IllegalArgumentException(s"unknown analyzer chain: $other")
    }
    (dl, counts)
  }
}
