package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.unsafe.types.UTF8String

import graft.analysis.{Analyzer, AnalyzeTfExpr}
import graft.dedup.ShinglesExpr
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
}
