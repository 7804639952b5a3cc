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

  /** 64-bit character-class mask of a term: bit (codepoint mod 64) per
    * distinct codepoint. One Damerau edit alters at most one character
    * occurrence — an insert/delete flips ≤ 1 class bit, a substitution
    * ≤ 2, a transposition 0 — so two terms within e edits satisfy
    * popcount(maskA ^ maskB) ≤ 2e. The contrapositive is the sound
    * O(1)-per-term prefilter [[FuzzyDict]] runs before any DP. */
  def classMask(t: String): Long = {
    var m = 0L
    var i = 0
    while (i < t.length) {
      val cp = t.codePointAt(i)
      m |= 1L << (cp & 63)
      i += Character.charCount(cp)
    }
    m
  }
}

/** Per-shard fuzzy candidate sidecar: the shard's dictionary bucketed by
  * codepoint length, each term carrying its [[Fuzzy.classMask]]. Candidate
  * generation runs two SOUND prefilters before the bounded Damerau DP:
  *
  *  1. length window — edit distance ≥ |len(t) − len(q)|, so only the
  *     ±e length bands are touched at all;
  *  2. mask popcount — popcount(mask(q) ^ mask(t)) > 2e proves
  *     distance > e (one XOR + POPCNT per banded term).
  *
  * Neither filter can reject a true candidate, so the expansion set — and
  * every downstream hash — is identical to the full-vocabulary sweep this
  * replaces (FuzzySidecarSpec asserts set-identity on random corpora; the
  * q_field_suggest / q_field_fuzzy oracles pin it end-to-end). The sweep
  * ran the DP against EVERY dictionary key per query term; the sidecar
  * scans only the length bands (for web-scale vocabularies dominated by
  * long-tail lengths, a small fraction) and DPs only mask-plausible terms
  * (at e ≤ 2 the 2e-bit budget kills most of a band). The next rung on
  * this ladder is Lucene's FST × Levenshtein-automaton intersection —
  * same per-shard placement, sublinear in band size.
  *
  * Built lazily on the first fuzzy/suggest query against a shard and
  * cached in the resident [[Searcher.ShardIndex]] (@transient — rebuilt
  * after partition eviction); ~40 B/term, one dictionary pass. */
final class FuzzyDict private (
    private val lens: Array[Int],               // distinct lengths, asc
    private val terms: Array[Array[String]],    // per-length terms
    private val masks: Array[Array[Long]],      // classMask per term
    private val dfs: Array[Array[Long]])        // shard-local df per term
    extends Serializable {

  /** (term, df, distance ≤ maxE) candidates for one query term. */
  def candidates(q: String, maxE: Int): Iterator[(String, Long, Int)] = {
    val lq = q.codePointCount(0, q.length)
    val mq = Fuzzy.classMask(q)
    // binary-search the first length ≥ lq − maxE, walk to lq + maxE
    var lo = 0
    var hi = lens.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (lens(mid) < lq - maxE) lo = mid + 1 else hi = mid
    }
    new Iterator[(String, Long, Int)] {
      private var bi = lo
      private var ti = 0
      private var nxt: (String, Long, Int) = _
      private def advance(): Unit = {
        nxt = null
        while (nxt == null && bi < lens.length && lens(bi) <= lq + maxE) {
          val ts = terms(bi)
          val ms = masks(bi)
          while (nxt == null && ti < ts.length) {
            if (java.lang.Long.bitCount(mq ^ ms(ti)) <= 2 * maxE) {
              val d = Fuzzy.damerau(q, ts(ti), maxE)
              if (d <= maxE) nxt = (ts(ti), dfs(bi)(ti), d)
            }
            ti += 1
          }
          if (nxt == null) { bi += 1; ti = 0 }
        }
      }
      advance()
      def hasNext: Boolean = nxt != null
      def next(): (String, Long, Int) = {
        val r = nxt; advance(); r
      }
    }
  }
}

object FuzzyDict {
  /** One pass over a shard's dictionary → length-bucketed sidecar. */
  def build(dict: java.util.HashMap[String, Searcher.TermPostings]): FuzzyDict = {
    val byLen = new java.util.TreeMap[Int,
      scala.collection.mutable.ArrayBuffer[(String, Long)]]()
    val it = dict.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val t = e.getKey
      val l = t.codePointCount(0, t.length)
      var buf = byLen.get(l)
      if (buf == null) {
        buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
        byLen.put(l, buf)
      }
      buf += ((t, e.getValue.df))
    }
    val n = byLen.size()
    val lens = new Array[Int](n)
    val terms = new Array[Array[String]](n)
    val masks = new Array[Array[Long]](n)
    val dfs = new Array[Array[Long]](n)
    var i = 0
    val bit = byLen.entrySet().iterator()
    while (bit.hasNext) {
      val e = bit.next()
      lens(i) = e.getKey
      val arr = e.getValue
      terms(i) = arr.map(_._1).toArray
      masks(i) = terms(i).map(Fuzzy.classMask)
      dfs(i) = arr.map(_._2).toArray
      i += 1
    }
    new FuzzyDict(lens, terms, masks, dfs)
  }
}
