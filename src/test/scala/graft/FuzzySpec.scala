package graft

import scala.collection.mutable

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.query.Fuzzy

/** Pins [[Fuzzy.damerau]] to the FULL (unrestricted) Damerau-Levenshtein
  * metric — the one DuckDB's damerau_levenshtein computes and the oracle
  * replays — via known vectors (verified against DuckDB 1.0) and a BFS
  * ground truth over tiny alphabets: the true metric IS the shortest
  * ins/del/sub/adjacent-transpose edit sequence, which BFS enumerates. */
class FuzzySpec extends AnyFunSuite {

  test("known vectors (DuckDB-verified)") {
    // CA→ABC distinguishes full DL (2) from OSA (3)
    assert(Fuzzy.damerau("CA", "ABC", 4) === 2)
    assert(Fuzzy.damerau("ab", "ba", 4) === 1)
    assert(Fuzzy.damerau("abcd", "acbd", 4) === 1)
    assert(Fuzzy.damerau("recrod", "record", 2) === 1)
    assert(Fuzzy.damerau("", "abc", 4) === 3)
    assert(Fuzzy.damerau("abc", "", 4) === 3)
    assert(Fuzzy.damerau("same", "same", 2) === 0)
    // bound clamp: values beyond the bound report bound + 1
    assert(Fuzzy.damerau("aaaa", "bbbb", 2) === 3)
    assert(Fuzzy.damerau("a", "abcdef", 2) === 3) // length pre-filter
  }

  test("AUTO edit budget (ES AUTO:3,6)") {
    assert(Fuzzy.autoEdits("ab") === 0)
    assert(Fuzzy.autoEdits("abc") === 1)
    assert(Fuzzy.autoEdits("abcde") === 1)
    assert(Fuzzy.autoEdits("abcdef") === 2)
  }

  /** BFS shortest edit sequence with ops {insert, delete, substitute,
    * transpose-adjacent} — the unrestricted DL metric by definition. */
  private def bfs(a: String, b: String, alphabet: Seq[Char], cap: Int): Int = {
    if (a == b) return 0
    val seen = mutable.Set(a)
    var frontier = List(a)
    var d = 0
    while (d < cap) {
      d += 1
      val next = mutable.ListBuffer.empty[String]
      for (s <- frontier) {
        val edits = mutable.ListBuffer.empty[String]
        for (i <- 0 to s.length; c <- alphabet)
          edits += s.substring(0, i) + c + s.substring(i) // insert
        for (i <- 0 until s.length)
          edits += s.substring(0, i) + s.substring(i + 1) // delete
        for (i <- 0 until s.length; c <- alphabet if c != s(i))
          edits += s.substring(0, i) + c + s.substring(i + 1) // substitute
        for (i <- 0 until s.length - 1 if s(i) != s(i + 1))
          edits += (s.substring(0, i) + s(i + 1) + s(i) +
            s.substring(i + 2)) // transpose
        for (e <- edits if e.length <= b.length + cap && !seen(e)) {
          if (e == b) return d
          seen += e
          next += e
        }
      }
      frontier = next.toList
    }
    cap + 1
  }

  test("full-DL == BFS ground truth on random tiny strings") {
    val alphabet = Seq('a', 'b', 'c')
    val strGen = Gen.chooseNum(0, 4).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(alphabet)).map(_.mkString))
    val p = Prop.forAll(strGen, strGen) { (a, b) =>
      val expect = bfs(a, b, alphabet, 5)
      Fuzzy.damerau(a, b, 8) == expect &&
        // bounded variant agrees wherever the true distance ≤ bound
        (expect > 2 || Fuzzy.damerau(a, b, 2) == expect)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(400), p)
    assert(res.passed, s"fuzzy-bfs: ${res.status}")
  }
}
