package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.unsafe.types.UTF8String

import graft.analysis.{Analyzer, AnalyzeTfExpr}
import graft.dedup.{Dedup, ShinglesExpr}
import graft.text.HashKernels
import graft.web.{HtmlExtract, WebtextGen}

/** Property tests for the pure JVM kernels behind the native Catalyst
  * expressions — each checked against an independent straightforward
  * reference implementation over randomized inputs. */
class KernelSpec extends AnyFunSuite {

  private def check(name: String, p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, s"$name: ${res.status}")
  }

  private val wordGen: Gen[String] = Gen.oneOf(
    Gen.alphaLowerStr.map(_.take(8)).suchThat(_.nonEmpty),
    Gen.oneOf("the", "r&d", "<tag>", "Åström", "naïve", "x9", "\"w9\""))
  private val textGen: Gen[String] =
    Gen.listOf(wordGen).map(_.mkString(" "))

  test("AnalyzeTfExpr.analyzeTf == analyzeStop token counts (dl, tfs)") {
    check("analyzeTf", Prop.forAll(textGen) { text =>
      val row = AnalyzeTfExpr.analyzeTf(UTF8String.fromString(text))
      val toks = Analyzer.analyzeStop(text)
      val expected = toks.groupBy(identity).view.mapValues(_.length).toMap
      val arr = row.getArray(1)
      val got = (0 until arr.numElements()).map { i =>
        val st = arr.getStruct(i, 2)
        st.getUTF8String(0).toString -> st.getInt(1)
      }.toMap
      val sortedTerms = (0 until arr.numElements()).map(i =>
        arr.getStruct(i, 2).getUTF8String(0).toString)
      row.getInt(0) == toks.length && got == expected &&
        sortedTerms == sortedTerms.sorted
    })
  }

  test("ShinglesExpr.shingles == split/sliding/distinct reference") {
    check("shingles", Prop.forAll(textGen) { text =>
      val got = {
        val a = ShinglesExpr.shingles(UTF8String.fromString(text))
        (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
      }
      val toks = text.split(" ", -1)
      val expected =
        if (toks.length < 3) Seq.empty[String]
        else toks.sliding(3).map(_.mkString(" ")).toSeq.distinct
      got == expected
    })
  }

  test("extractor inverts the generator for arbitrary vocab texts") {
    val genText: Gen[String] = Gen.nonEmptyListOf(
      Gen.chooseNum(0, WebtextGen.VocabSize - 1).map(WebtextGen.word))
      .map(_.mkString(" "))
    check("extract∘htmlFor", Prop.forAll(genText, Gen.chooseNum(0L, 1L << 40)) {
      (text, id) =>
        HtmlExtract.extract(WebtextGen.htmlFor(id, text)) == text
    })
  }

  test("htmlFor emits well-formed paragraphs on degenerate texts") {
    // degenerate inputs outside the generator's vocab: trailing/leading
    // spaces and the empty text must still close every <p> (the extractor
    // collapses+trims whitespace, so the round-trip is modulo trim here)
    def paraBalanced(html: String): Boolean =
      html.sliding(3).count(_ == "<p ") == html.sliding(4).count(_ == "</p>")
    val degenerate = Gen.oneOf("", " ", "a ", " a", "a  b", "w1 w2 ", "  ")
    check("htmlFor-degenerate", Prop.forAll(degenerate) { text =>
      val html = new String(WebtextGen.htmlFor(7L, text), "UTF-8")
      paraBalanced(html) && html.contains("</p></body>") &&
        HtmlExtract.extract(WebtextGen.htmlFor(7L, text)) ==
          text.trim.replaceAll(" +", " ")
    })
  }

  test("FieldTfExpr.analyzeTf == analyzeChain token counts for every chain") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import graft.analysis.FieldTfExpr
    val valsGen: Gen[List[String]] = Gen.listOf(Gen.oneOf(
      Gen.alphaLowerStr.map(_.take(6)),
      Gen.oneOf("", "The Fast", "Åström 9", "a b the", "MIXED case")))
    val chains = Seq(Analyzer.Keyword, Analyzer.KeywordFold,
      Analyzer.Text, Analyzer.TextStop)
    for (kind <- chains) {
      check(s"fieldTf-$kind", Prop.forAll(valsGen) { vals =>
        val arr = new GenericArrayData(
          vals.map(v => UTF8String.fromString(v): Any).toArray)
        val row = FieldTfExpr.analyzeTf(arr, kind)
        val got = {
          val a = row.getArray(1)
          (0 until a.numElements()).map { i =>
            val st = a.getStruct(i, 2)
            st.getUTF8String(0).toString -> st.getInt(1)
          }.toMap
        }
        // reference: the per-value query-side chain, counted (keyword
        // chains: one token per non-empty value)
        val toks = vals.flatMap {
          case "" => Nil
          case v => Analyzer.analyzeChain(kind, v).toList
        }
        val expected = toks.groupBy(identity).view.mapValues(_.length).toMap
        row.getInt(0) == toks.length && got == expected
      })
    }
  }

  // ---- HashKernels: row-local dedup/fingerprint signature kernels --------

  // codepoint fold — what the DuckDB oracle's ascii(substr(c,i,1)) char
  // fold computes for ANY input, not just ASCII (ADVICE r2: the former
  // byte fold silently diverged from the oracle on non-ASCII text)
  private def refPolyHash(s: String): Long =
    s.codePoints().toArray.foldLeft(0L)((h, cp) => (h * 131 + cp) % Dedup.P)

  test("HashKernels.polyHash == codepoint-fold reference (incl. non-ASCII)") {
    check("polyHash", Prop.forAll(textGen) { text =>
      HashKernels.polyHash(UTF8String.fromString(text)) == refPolyHash(text)
    })
    // pin each UTF-8 width explicitly: 2-byte (é), 3-byte (€), 4-byte (😀)
    for (s <- Seq("é", "€", "😀", "Åström naïve 😀€"))
      assert(HashKernels.polyHash(UTF8String.fromString(s)) == refPolyHash(s),
        s"codepoint fold diverged on '$s'")
  }

  test("HashKernels.minHashSig == per-shingle affine-min reference") {
    check("minHashSig", Prop.forAll(textGen) { text =>
      val a = HashKernels.minHashSig(UTF8String.fromString(text))
      val got = (0 until a.numElements()).map(a.getLong)
      val toks = text.split(" ", -1)
      val expected =
        if (toks.length < 3) Seq.empty[Long]
        else {
          val sids = toks.sliding(3).map(w => refPolyHash(w.mkString(" "))).toSeq
          Dedup.MinHashFns.map { case (_, af, bf) =>
            sids.map(sid => (af * sid + bf) % Dedup.P).min
          }
        }
      got == expected
    })
  }

  test("HashKernels.simHash == tf-weighted sign-sum reference") {
    check("simHash", Prop.forAll(textGen) { text =>
      val got = HashKernels.simHash(UTF8String.fromString(text))
      val tf = text.split(" ", -1).groupBy(identity).view.mapValues(_.length)
      val expected = Dedup.SimHashFns.map { case (j, af, bf) =>
        val s = tf.map { case (t, n) =>
          n.toLong * (((af * refPolyHash(t) + bf) % Dedup.P % 2) * 2 - 1)
        }.sum
        if (s > 0) 1L << j else 0L
      }.sum
      got == expected
    })
  }

  test("HashKernels.fingerprint == ordered rolling-hash reference; order-sensitive") {
    check("fingerprint", Prop.forAll(textGen) { text =>
      val got = HashKernels.fingerprint(UTF8String.fromString(text))
      val expected = text.split(" ", -1).foldLeft(0L)((h, t) =>
        (h * 31 + refPolyHash(t)) % graft.text.TextOps.HashP)
      got == expected
    })
    assert(HashKernels.fingerprint(UTF8String.fromString("a b c")) !=
      HashKernels.fingerprint(UTF8String.fromString("c b a")))
  }
}
