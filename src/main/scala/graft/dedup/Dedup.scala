package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Near-duplicate detection operators over the documents corpus: word-shingle
  * exact Jaccard, MinHash+LSH (shingle → minhash signature → banded
  * bucket-join → exact verify), and SimHash fingerprints.
  *
  * Cross-engine determinism: every hash is plain integer arithmetic over a
  * data-derived dense id (dense_rank over the sorted distinct shingle/term
  * vocabulary), so the DuckDB oracle computes bit-identical signatures.
  * Scale note: at 10^12 docs the dense_rank dictionary (a global sort) would
  * be replaced by xxhash64 directly on the shingle bytes — same algorithm,
  * different id function; the dictionary join is broadcast-sized here and
  * the LSH band join is the scalable part (candidates ≪ n²).
  */
object Dedup {

  val P: Long = 2147483647L // 2^31 - 1

  /** 16 deterministic affine hash functions (hid, a, b). */
  val MinHashFns: Seq[(Int, Long, Long)] = (0 until 16).map { i =>
    val a = (2654435761L * (i + 1)) % P | 1L
    val b = (40503L * (i + 7) * 2654435761L) % P
    (i, a, b)
  }
  val BandRows = 4 // 16 hashes → 4 bands of 4

  /** 16 deterministic bit-hash functions for SimHash (j, a, b). */
  val SimHashFns: Seq[(Int, Long, Long)] = (0 until 16).map { i =>
    val a = (0x9e3779b97f4aL * (i + 3)) % P | 1L
    val b = (0x85ebca6bL * (i + 11)) % P
    (i, a, b)
  }

  private def toks: Column = split(col("text"), " ")

  /** Distinct word 3-shingles per doc (raw whitespace tokens — dedup works
    * on surface text, not the stopworded analysis chain). Reference HOF
    * formulation kept in [[shinglesRef]]; production path is the native
    * codegen [[ShinglesExpr]] (identical output, asserted in spec). */
  def shingles(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      explode(ShinglesExpr.shinglesCol(col("text"))).as("shingle"))

  /** Interpreted Column formulation — the spec oracle for ShinglesExpr. */
  def shinglesRef(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      explode(array_distinct(when(size(toks) >= 3,
        transform(sequence(lit(1), size(toks) - 2), i =>
          concat_ws(" ", element_at(toks, i), element_at(toks, i + 1),
            element_at(toks, i + 2))))
        .otherwise(array().cast("array<string>")))).as("shingle"))

  /** Exact n-gram Jaccard pairs ≥ thr: inverted-index self-join on shingle
    * (only co-occurring pairs materialize — never the n² cross product),
    * intersection counts, |A∪B| from per-doc set sizes. */
  def ngramJaccardPairs(docs: DataFrame, thr: Double): DataFrame = {
    val sh = shingles(docs).cache()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val a = sh.as("a"); val b = sh.as("b")
    val inter = a.join(b, col("a.shingle") === col("b.shingle") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("c"))
    val jac = inter
      .join(broadcast(sizes).as("sa"), col("a_id") === col("sa.doc_id"))
      .join(broadcast(sizes).as("sb"), col("b_id") === col("sb.doc_id"))
      .select(col("a_id"), col("b_id"),
        (col("c").cast("double") / (col("sa.n") + col("sb.n") - col("c")))
          .as("jac"))
    jac.filter(col("jac") >= thr)
      .select(col("a_id"), col("b_id"),
        round(col("jac") * 1e6).cast("long").as("jac_x6"))
      .orderBy("a_id", "b_id")
  }

  /** Dense shingle ids — cross-engine-deterministic (1-based rank in the
    * sorted distinct vocabulary, identical to the oracle's dense_rank).
    * The dictionary is vocabulary-sized, so it is built driver-side and
    * broadcast as a map lookup — no single-partition window stage, no
    * dictionary join shuffle. (The 10^12-scale variant hashes shingle
    * bytes directly — see the scale note in the object doc.) */
  private def shingleIds(sh: DataFrame): DataFrame = {
    val spark = sh.sparkSession
    import spark.implicits._
    val sorted = sh.select("shingle").distinct().as[String].collect().sorted
    val dict = new java.util.HashMap[String, Long](sorted.length * 2)
    var i = 0
    while (i < sorted.length) { dict.put(sorted(i), i + 1L); i += 1 }
    val bc = spark.sparkContext.broadcast(dict)
    val sidUdf = udf((s: String) => bc.value.get(s))
    sh.select(col("doc_id"), sidUdf(col("shingle")).as("sid"))
  }

  /** MinHash + banded LSH near-dup pairs, exact-verified at thr:
    * signature → band buckets → candidate pairs (bucket join) → exact
    * shingle-Jaccard filter. Output identical to the oracle because the
    * hash arithmetic and band signatures are identical.
    *
    * All 16 minhashes are 16 min-aggregates over ONE pass of the
    * (doc, sid) relation — not a crossJoin with the function table, which
    * multiplies the shuffle 16× and needs a 16×-wider aggregate. Band
    * signatures are plain column concatenation (same equality semantics as
    * the sorted collect_list formulation). */
  def minHashLshPairs(docs: DataFrame, thr: Double): DataFrame = {
    val sh = shingles(docs).cache()
    val ids = shingleIds(sh)
    val mhAggs = MinHashFns.map { case (h, a, b) =>
      min((lit(a) * col("sid") + lit(b)) % P).as(s"mh$h")
    }
    val sigs = ids.groupBy(col("doc_id")).agg(mhAggs.head, mhAggs.tail: _*)
    val bandStructs = (0 until MinHashFns.length / BandRows).map { band =>
      struct(lit(band).as("band"),
        concat_ws(",", (0 until BandRows).map(r =>
          col(s"mh${band * BandRows + r}").cast("string")): _*).as("sig"))
    }
    val bands = sigs
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
    // exact verify on candidates only
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = cand.join(sh.as("a"), col("a_id") === col("a.doc_id"))
      .join(sh.as("b"), col("b_id") === col("b.doc_id") &&
        col("a.shingle") === col("b.shingle"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("c"))
    inter
      .join(broadcast(sizes).as("sa"), col("a_id") === col("sa.doc_id"))
      .join(broadcast(sizes).as("sb"), col("b_id") === col("sb.doc_id"))
      .select(col("a_id"), col("b_id"),
        (col("c").cast("double") / (col("sa.n") + col("sb.n") - col("c"))).as("jac"))
      .filter(col("jac") >= thr)
      .select(col("a_id"), col("b_id"),
        round(col("jac") * 1e6).cast("long").as("jac_x6"))
      .orderBy("a_id", "b_id")
  }

  /** 16-bit SimHash fingerprint per doc over unigram term frequencies:
    * bit_j = [ Σ_t tf(t) · (2·((a_j·tid + b_j) mod p mod 2) − 1) > 0 ]. */
  def simHash(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"), explode(toks).as("term"))
    val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dict = tf.select("term").distinct()
      .withColumn("tid", dense_rank().over(Window.orderBy("term")).cast("long"))
    val spark = docs.sparkSession
    import spark.implicits._
    val fns = SimHashFns.toDF("j", "a", "b")
    tf.join(broadcast(dict), "term")
      .crossJoin(broadcast(fns))
      .withColumn("w", col("tf") * (((col("a") * col("tid") + col("b")) % P % 2) * 2 - 1))
      .groupBy(col("doc_id"), col("j"))
      .agg(sum(col("w")).as("s"))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("s") > 0, expr("shiftleft(CAST(1 AS BIGINT), j)"))
        .otherwise(lit(0L))).as("simhash"))
      .orderBy("doc_id")
  }
}
