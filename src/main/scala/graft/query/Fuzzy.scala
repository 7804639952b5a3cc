package graft.query

/** ES `match` with `fuzziness` — Lucene FuzzyQuery semantics re-expressed
  * for the distributed dictionary (SURVEY §2; public behavior: ES 7.17
  * fuzziness docs, Lucene FuzzyQuery/FuzzyTermsEnum).
  *
  *  - `AUTO` edit budget per analyzed query term: 0 for length ≤ 2, 1 for
  *    3-5, 2 for ≥ 6 (the ES AUTO:3,6 default), hard-capped at 2 (Lucene's
  *    LevenshteinAutomata ceiling).
  *  - Distance = full Damerau-Levenshtein (transpositions count 1 —
  *    Lucene's default `transpositions: true`; Lowrance-Wagner DP, codepoint
  *    alphabet). Matches DuckDB's `damerau_levenshtein` exactly, which is
  *    what the oracle replays.
  *  - Expansion cap = `max_expansions` (ES default 50), selected
  *    deterministically by (distance asc, df desc, term asc) — closest
  *    terms first, Lucene's top-terms rewrite ordering made total.
  *  - Per-expansion boost = 1 − d / min(|q|, |t|) (codepoints) — the
  *    FuzzyTermsEnum boost shape; a doc's score sums
  *    weight(q) · boost · idf(df_t) · tfNorm over all (query term,
  *    expansion) pairs (the bool/should-of-expansions rewrite, each
  *    expansion under its OWN df — not the blended-df variant; documented
  *    deterministic choice).
  */
object Fuzzy {

  /** ES AUTO fuzziness for one analyzed term (codepoint length). */
  def autoEdits(term: String): Int = {
    val n = term.codePointCount(0, term.length)
    if (n <= 2) 0 else if (n <= 5) 1 else 2
  }

  /** Full Damerau-Levenshtein distance (Lowrance-Wagner), early-exited to
    * `bound + 1` when the distance provably exceeds `bound`. Codepoint
    * comparison, matching DuckDB's character-based damerau_levenshtein on
    * any input the analyzers emit. */
  def damerau(a0: String, b0: String, bound: Int): Int = {
    val a = a0.codePoints().toArray
    val b = b0.codePoints().toArray
    val m = a.length
    val n = b.length
    if (math.abs(m - n) > bound) return bound + 1
    if (m == 0) return n
    if (n == 0) return m
    val inf = m + n
    // (m+2) x (n+2) with the Lowrance-Wagner sentinel border
    val d = Array.ofDim[Int](m + 2, n + 2)
    d(0)(0) = inf
    var i = 0
    while (i <= m) { d(i + 1)(0) = inf; d(i + 1)(1) = i; i += 1 }
    var j = 0
    while (j <= n) { d(0)(j + 1) = inf; d(1)(j + 1) = j; j += 1 }
    // No row-min early abandon: the transposition term reaches back to
    // arbitrary earlier rows (d(k)(l) + gaps), so a row's minimum exceeding
    // the bound does not bound later rows the way it does in plain
    // Levenshtein. The length pre-filter above is the cheap reject; the DP
    // itself is tiny for analyzed tokens.
    val da = new java.util.HashMap[Int, Int]()
    i = 1
    while (i <= m) {
      var db = 0
      j = 1
      while (j <= n) {
        val k = da.getOrDefault(b(j - 1), 0)
        val l = db
        val cost = if (a(i - 1) == b(j - 1)) { db = j; 0 } else 1
        val sub = d(i)(j) + cost
        val ins = d(i + 1)(j) + 1
        val del = d(i)(j + 1) + 1
        val tra = d(k)(l) + (i - k - 1) + 1 + (j - l - 1)
        var v = sub
        if (ins < v) v = ins
        if (del < v) v = del
        if (tra < v) v = tra
        d(i + 1)(j + 1) = v
        j += 1
      }
      da.put(a(i - 1), i)
      i += 1
    }
    math.min(d(m + 1)(n + 1), bound + 1)
  }

  /** Boost of an expansion at distance d: 1 − d / min(|q|, |t|). */
  def boost(q: String, t: String, d: Int): Double = {
    val lq = q.codePointCount(0, q.length)
    val lt = t.codePointCount(0, t.length)
    1.0 - d.toDouble / math.min(lq, lt)
  }
}
