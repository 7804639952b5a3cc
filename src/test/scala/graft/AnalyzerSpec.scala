package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analysis.Analyzer

/** Golden tests for the analysis chain — the engine-defined "reference
  * extractor" (SURVEY.md §2.11). These goldens pin the byte-identity contract:
  * the same function generates index tokens, query tokens, and these expected
  * values. */
class AnalyzerSpec extends AnyFunSuite {

  test("standard tokenizer: UAX#29 word breaks, keep alnum tokens") {
    // NB: the JDK word BreakIterator keeps intra-word hyphens ("foo-bar" is
    // one token) — this is the engine's pinned extractor semantics.
    assert(Analyzer.tokenize("Hello, world! foo-bar 2nd (x)").toSeq ===
      Seq("Hello", "world", "foo-bar", "2nd", "x"))
    assert(Analyzer.tokenize("").isEmpty)
    assert(Analyzer.tokenize(null).isEmpty)
    assert(Analyzer.tokenize("...---...").isEmpty)
    // apostrophes stay inside words per UAX#29 (MidLetter)
    assert(Analyzer.tokenize("it's O'Neil").toSeq === Seq("it's", "O'Neil"))
    // numbers with separators stay single tokens
    assert(Analyzer.tokenize("3.14 1,000").toSeq === Seq("3.14", "1,000"))
  }

  test("ascii folding strips Latin diacritics") {
    assert(Analyzer.fold("Åström") === "Astrom")
    assert(Analyzer.fold("déjà vu") === "deja vu")
    assert(Analyzer.fold("Cañón") === "Canon")
    assert(Analyzer.fold("plain ascii") === "plain ascii")
    assert(Analyzer.fold("ießen") === "ießen") // ß has no combining mark — kept
  }

  test("full chain: tokenize, lowercase, fold") {
    assert(Analyzer.analyze("Åström's Naïve Café").toSeq ===
      Seq("astrom's", "naive", "cafe"))
  }

  test("stopword chain drops the Lucene _english_ 33-word set") {
    assert(Analyzer.EnglishStop.size === 33)
    assert(Analyzer.analyzeStop("The quick and the dead").toSeq ===
      Seq("quick", "dead"))
    assert(Analyzer.analyzeStop("a the an and").isEmpty)
    // stop matching happens after lowercase+fold
    assert(Analyzer.analyzeStop("THE Fast").toSeq === Seq("fast"))
  }

  test("keyword analyzers") {
    assert(Analyzer.analyzeKeyword("10.1000/FOO.Bar") === "10.1000/foo.bar")
    assert(Analyzer.analyzeKeywordFold("Ö-Bahn") === "o-bahn")
  }

  test("oracle-parity: on single-space lowercase ascii corpora the chain " +
    "equals whitespace split + stop filter (the DuckDB oracle's tokenizer)") {
    val samples = Seq(
      "the fast key order sort table scan merge",
      "join a filter window row join stream customer data",
      "spark group query row data slow small filter")
    for (s <- samples) {
      val viaSplit = s.split(" ").filterNot(Analyzer.EnglishStop.contains).toSeq
      assert(Analyzer.analyzeStop(s).toSeq === viaSplit, s"corpus parity on: $s")
    }
  }

  test("positions: stopword gaps, multi-value increment gap, keyword value index") {
    import scala.jdk.CollectionConverters._
    def posOf(kind: String, values: Seq[String]): Map[String, Seq[Int]] = {
      val (_, accs) = Analyzer.chainCountsPos(kind, values.iterator)
      accs.entrySet().asScala
        .map(e => e.getKey -> e.getValue.positions.toSeq).toMap
    }
    // stopword removed, its position slot kept (Lucene StopFilter
    // increments preserved): "united of states" → united@0, states@2
    assert(posOf(Analyzer.TextStop, Seq("united of states")) ===
      Map("united" -> Seq(0), "states" -> Seq(2)))
    // multi-value gap: value 2 starts at len(value1 tokens) + gap
    // ("a" is a stopword → gap at 0; "b" is not in the _english_ set)
    assert(posOf(Analyzer.TextStop, Seq("a b quick", "brown fox")) ===
      Map("b" -> Seq(1), "quick" -> Seq(2),
        "brown" -> Seq(103), "fox" -> Seq(104)))
    // repeated term accumulates ascending positions across values
    assert(posOf(Analyzer.Text, Seq("x y x")) ===
      Map("x" -> Seq(0, 2), "y" -> Seq(1)))
    // keyword chains: one position per kept value, empties skipped
    assert(posOf(Analyzer.KeywordFold, Seq("A", "", "B", "A")) ===
      Map("a" -> Seq(0, 2), "b" -> Seq(1)))
    // dl/tf agree with the positionless twin on every chain
    for (kind <- Analyzer.Chains) {
      val vals = Seq("The quick brown Fox", "jumps over the lazy dog", "")
      val (dl0, counts) = Analyzer.chainCounts(kind, vals.iterator)
      val (dl1, accs) = Analyzer.chainCountsPos(kind, vals.iterator)
      assert(dl0 === dl1, kind)
      assert(counts.asScala.map { case (k, v) => k -> v.intValue() }.toMap ===
        accs.asScala.map { case (k, v) => k -> v.tf }.toMap, kind)
      accs.asScala.values.foreach(a =>
        assert(a.positions.toSeq === a.positions.toSeq.sorted))
    }
  }

  test("query-side phrase analysis mirrors index positions (gaps preserved)") {
    assert(Analyzer.analyzeChainPos(Analyzer.TextStop, "united of states").toSeq
      === Seq(("united", 0), ("states", 2)))
    assert(Analyzer.analyzeChainPos(Analyzer.Text, "Quick  Brown").toSeq
      === Seq(("quick", 0), ("brown", 1)))
    assert(Analyzer.analyzeChainPos(Analyzer.Keyword, "A b").toSeq
      === Seq(("a b", 0)))
    assert(Analyzer.analyzeChainPos(Analyzer.TextStop, "").isEmpty)
  }
}
