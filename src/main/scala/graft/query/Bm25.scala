package graft.query

/** Exact Lucene-8 BM25 (the scoring engine behind the reference's
  * Elasticsearch 7.17.10 / Lucene 8.11 index — public defaults, reference
  * `go.mod:9`, `docker-compose.yaml:4`).
  *
  * idf(t)  = ln(1 + (N − df + 0.5) / (df + 0.5))
  * score   = Σ_t idf(t) · tf / (tf + k1·(1 − b + b·dl/avgdl))
  *
  * k1 = 1.2, b = 0.75. Lucene 8.0 removed the (k1+1) numerator factor
  * (LUCENE-8563), so it is absent here too. Per the north_rule, dl/avgdl/df
  * are exact (no Lucene 1-byte norm quantization, no approx_count_distinct):
  * the same closed-form formula is computable in DuckDB SQL, which is what
  * makes rank-identity independently checkable.
  */
object Bm25 extends Serializable {
  val K1: Double = 1.2
  val B: Double = 0.75

  def idf(nDocs: Long, df: Long): Double =
    math.log(1.0 + (nDocs - df + 0.5) / (df + 0.5))

  def tfNorm(tf: Double, dl: Double, avgdl: Double): Double =
    tf / (tf + K1 * (1.0 - B + B * dl / avgdl))

  def score(tf: Double, df: Long, nDocs: Long, dl: Double, avgdl: Double): Double =
    idf(nDocs, df) * tfNorm(tf, dl, avgdl)

  /** Upper bound of a term's per-doc contribution given the max tf-norm seen
    * in a posting block — the block-max metadata WAND prunes with. */
  def maxScore(idfVal: Double, maxTfNorm: Double): Double = idfVal * maxTfNorm
}
