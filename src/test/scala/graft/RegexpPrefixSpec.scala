package graft

import java.util.regex.Pattern

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.index.FieldedIndex

/** Soundness of the regexp literal-prefix accelerator: pruning the sorted
  * dictionary with `startsWith(regexLiteralPrefix(rx))` must never lose a
  * whole-term match of `^(?:rx)$` — for ANY pattern the grammar below can
  * produce (literals, `.`, classes, groups, `? * + {m,n}` quantifiers,
  * top-level and grouped alternation, escapes). The prefix is allowed to
  * be empty (no pruning), never wrong. */
class RegexpPrefixSpec extends AnyFunSuite {

  private def check(name: String, p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(500), p)
    assert(res.passed, s"$name: ${res.status}")
  }

  // pattern grammar over the alphabet {a,b,c}; terms draw from {a,b,c,d}
  // so class complements and misses are exercised
  private val litGen: Gen[String] = Gen.oneOf("a", "b", "c", "ab", "bc")
  private val atomGen: Gen[String] = Gen.frequency(
    5 -> litGen,
    2 -> Gen.oneOf("[ab]", "[a-c]", "[^a]"),
    1 -> Gen.const("."),
    1 -> Gen.oneOf("\\.", "\\d"),
    1 -> litGen.map(l => s"($l)"))
  private val quantGen: Gen[String] =
    Gen.oneOf("", "", "?", "*", "+", "{0,2}", "{1,2}", "{2}")
  private val pieceGen: Gen[String] = for {
    a <- atomGen; q <- quantGen
  } yield a + q
  private val branchGen: Gen[String] = for {
    n <- Gen.chooseNum(1, 4)
    ps <- Gen.listOfN(n, pieceGen)
  } yield ps.mkString
  private val rxGen: Gen[String] = Gen.frequency(
    3 -> branchGen,
    1 -> (for { a <- branchGen; b <- branchGen } yield s"$a|$b"),
    1 -> (for { a <- branchGen; b <- branchGen } yield s"($a|$b)"))

  private val termGen: Gen[String] = for {
    n <- Gen.chooseNum(0, 8)
    cs <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d", "."))
  } yield cs.mkString

  test("literal prefix never loses a whole-term match (500 random patterns)") {
    val p = Prop.forAll(rxGen, Gen.listOfN(40, termGen)) { (rx, terms) =>
      val compiled = Pattern.compile("^(?:" + rx + ")$")
      val prefix = FieldedIndex.regexLiteralPrefix(rx)
      terms.forall { t =>
        !compiled.matcher(t).matches() || t.startsWith(prefix)
      }
    }
    check("prefix-soundness", p)
  }

  test("the prefix really prunes when the pattern leads with literals") {
    assert(FieldedIndex.regexLiteralPrefix("abc[xy]z*") === "abc")
    // any '|' anywhere disables the prefix (the conservative rule —
    // a grouped alternation COULD keep "ab", top-level could not; the
    // scanner doesn't parse nesting, so both give up)
    assert(FieldedIndex.regexLiteralPrefix("ab(c|d)") === "")
    assert(FieldedIndex.regexLiteralPrefix("a.c") === "a")
  }
}
