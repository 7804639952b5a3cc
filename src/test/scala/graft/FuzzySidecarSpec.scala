package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.query.{Fuzzy, FuzzyDict, Searcher}

/** Exactness properties of the fuzzy-candidate sidecar: the length-band +
  * class-mask prefilters must be SOUND (never reject a term within the
  * edit budget), so [[FuzzyDict.candidates]] returns exactly the set the
  * retired full-vocabulary Damerau sweep returned — same terms, same
  * dfs, same distances — on arbitrary dictionaries and query terms. */
class FuzzySidecarSpec extends AnyFunSuite {

  private def check(name: String, p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, s"$name: ${res.status}")
  }

  // words over a small alphabet INCLUDING multi-byte codepoints, so the
  // codepoint-length buckets and masks are exercised beyond ASCII
  private val alpha = "abcdeé€😀".toCharArray // é, €, 😀(surrogate)
  private val wordGen: Gen[String] = for {
    n <- Gen.chooseNum(1, 9)
    cs <- Gen.listOfN(n, Gen.oneOf(
      "a", "b", "c", "d", "e", "é", "€", new String(Character.toChars(0x1F600))))
  } yield cs.mkString

  private val dictGen: Gen[Map[String, Long]] = for {
    n <- Gen.chooseNum(0, 60)
    ws <- Gen.listOfN(n, wordGen)
    dfs <- Gen.listOfN(n, Gen.chooseNum(1L, 100L))
  } yield ws.zip(dfs).toMap

  private def sweep(dict: Map[String, Long], q: String,
                    maxE: Int): Set[(String, Long, Int)] =
    dict.iterator.flatMap { case (t, df) =>
      val d = Fuzzy.damerau(q, t, maxE)
      if (d <= maxE) Some((t, df, d)) else None
    }.toSet

  private def sidecar(dict: Map[String, Long], q: String,
                      maxE: Int): Set[(String, Long, Int)] = {
    val hm = new java.util.HashMap[String, Searcher.TermPostings]()
    dict.foreach { case (t, df) =>
      hm.put(t, new Searcher.TermPostings(df, Array.empty))
    }
    FuzzyDict.build(hm).candidates(q, maxE).toSet
  }

  test("sidecar candidates == full-vocab sweep (set identity, all budgets)") {
    val p = Prop.forAll(dictGen, wordGen, Gen.oneOf(1, 2)) {
      (dict, q, maxE) => sidecar(dict, q, maxE) == sweep(dict, q, maxE)
    }
    check("sidecar-exactness", p)
  }

  test("class-mask bound is sound: dist <= e implies popcount(xor) <= 2e") {
    val p = Prop.forAll(wordGen, wordGen) { (a, b) =>
      val d = Fuzzy.damerau(a, b, 2)
      d > 2 ||
        java.lang.Long.bitCount(Fuzzy.classMask(a) ^ Fuzzy.classMask(b)) <= 2 * d
    }
    check("mask-soundness", p)
  }
}
