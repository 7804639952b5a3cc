package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.harness.PipelineQueries
import graft.sim.Ann
import graft.dedup.Dedup

/** Training-data-pipeline operator tests at sf0.001: LSH recall vs the exact
  * baseline, minhash-vs-exact agreement, simhash locality, text-op sanity. */
class PipelineSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"
  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")
  private def docs = spark.read.parquet(s"$sf/documents.parquet")

  test("LSH ANN hits are a subset of the corpus and recall@10 >= 0.3 vs brute force") {
    val brute = Ann.bruteTopK(emb, 0L, 10).collect().map(_.getLong(0)).toSet
    val lsh = Ann.lshTopK(emb, 0L, 10).collect().map(_.getLong(0)).toSet
    assert(lsh.nonEmpty)
    val recall = (brute intersect lsh).size.toDouble / brute.size
    // 8 hyperplanes over 500 vectors: bucket holds ~1/256 of corpus plus the
    // query's near neighbours; recall is approximate by design
    assert(recall >= 0.3, s"recall=$recall brute=$brute lsh=$lsh")
  }

  test("IVF ANN: cells partition the corpus; probed top-k has recall vs brute") {
    val brute = Ann.bruteTopK(emb, 0L, 10).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ivf = Ann.ivfTopK(emb, 0L, 10).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ivf.nonEmpty)
    // probing 2 of 8 cells: the query's own cell holds its near neighbours
    val recall = (brute.keySet intersect ivf.keySet).size.toDouble / brute.size
    assert(recall >= 0.3, s"recall=$recall brute=${brute.keySet} ivf=${ivf.keySet}")
    // shared hits carry identical exact cosines
    (brute.keySet intersect ivf.keySet).foreach(id =>
      assert(brute(id) === ivf(id)))
  }

  test("LSH hit scores match brute-force scores for shared vec_ids") {
    val brute = Ann.bruteTopK(emb, 0L, 10).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lsh = Ann.lshTopK(emb, 0L, 10).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((id, s) <- lsh if brute.contains(id)) assert(brute(id) === s)
  }

  test("minhash+LSH verified pairs ⊆ exact ngram pairs (same threshold)") {
    val exact = Dedup.ngramJaccardPairs(docs, PipelineQueries.JaccardThr)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val mh = Dedup.minHashLshPairs(docs, PipelineQueries.JaccardThr)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(mh.subsetOf(exact), s"minhash found non-pairs: ${mh -- exact}")
    assert(mh.nonEmpty)
    // high-similarity pairs (jac >= 0.5) are found w.h.p. with 4x4 bands
    val strong = exact.filter(_._3 >= 500000)
    assert(strong.subsetOf(mh), s"missed strong pairs: ${strong -- mh}")
  }

  test("simhash: near-identical docs land at small hamming distance") {
    val fp = Dedup.simHash(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val near = Dedup.ngramJaccardPairs(docs, 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(near.nonEmpty)
    for ((a, b) <- near) {
      val ham = java.lang.Long.bitCount(fp(a) ^ fp(b))
      // 32-bit fingerprints: near-identical docs stay in the low quarter
      // of the bit width (the 16-bit threshold was 4)
      assert(ham <= 8, s"docs $a,$b jac>=0.8 but hamming $ham")
    }
  }

  test("text ops sanity: ratios bounded, fingerprint order-sensitive") {
    val q = PipelineQueries.quality(spark, sf).collect()
    for (r <- q) {
      assert(r.getAs[Long]("stop_ratio_x6") <= 1000000L)
      assert(r.getAs[Long]("uniq_ratio_x6") <= 1000000L)
      assert(r.getAs[Long]("avg_word_len_x6") > 0)
    }
    import spark.implicits._
    val two = Seq((1L, "a b c"), (2L, "c b a")).toDF("doc_id", "text")
    val fps = graft.text.TextOps.fingerprint(two).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) !== fps(2L))
  }

  test("lang id predicts profile languages on real multilingual text") {
    import spark.implicits._
    val samples = Seq(
      (1L, "der hund und die katze ist nicht hier"),
      (2L, "the cat is in the house and that is fine"),
      (3L, "el perro es un animal de la casa"),
      (4L, "le chat est dans la maison des voisins"),
      (5L, "我 是 一 个 学生 的 朋友 和 不 在")).toDF("doc_id", "text")
    val got = graft.text.TextOps.langId(samples).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === "de")
    assert(got(2L) === "en")
    assert(got(3L) === "es")
    assert(got(4L) === "fr")
    assert(got(5L) === "zh")
  }

  test("native shingles kernel matches the HOF reference formulation") {
    val native = Dedup.shingles(docs).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val ref = Dedup.shinglesRef(docs).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(native.nonEmpty)
    assert(native === ref)
  }

  test("native dot/lsh-bucket kernels match the Column-fold reference formulation") {
    import org.apache.spark.sql.functions._
    // dot + norm: native expression vs zip_with/aggregate fold, same rows
    val foldDot = aggregate(
      zip_with(col("embedding"), col("embedding"),
        (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (s, v) => s + v)
    val both = emb.select(col("vec_id"),
      Ann.dot(col("embedding"), col("embedding")).as("native"),
      foldDot.as("ref")).collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getDouble(1) === r.getDouble(2),
      s"dot mismatch vec_id=${r.getLong(0)}"))

    // one-pass lsh bucket array vs the per-table fold formulation
    val refBuckets = array((0 until Ann.LshTables).map(t =>
      Ann.bucketCol(col("embedding"), t)): _*)
    val bk = emb.limit(50).select(
      Ann.bucketsCol(col("embedding")).as("native"), refBuckets.as("ref"))
      .collect()
    bk.foreach { r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1))
    }
  }

  test("connected components: chains merge, clusters label by min member (both paths)") {
    import spark.implicits._
    // 1-2-3-7 is a 3-hop chain; 10-11 an independent pair; plus a longer
    // drift chain 20..29 (exercises >1 relax+jump round on the
    // distributed path)
    val pairs = (Seq((1L, 2L), (2L, 3L), (10L, 11L), (7L, 3L)) ++
      (20L until 29L).map(i => (i + 1, i))).toDF("a_id", "b_id")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 1L,
      10L -> 10L, 11L -> 10L) ++ (20L to 29L).map(_ -> 20L).toMap
    // driver union-find path (default threshold)
    val ccDriver = graft.dedup.Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ccDriver === expected)
    // distributed relax+jump path (the 100-TB shape), forced via the seam
    val prev = graft.dedup.Dedup.ccDriverMaxEdges
    try {
      graft.dedup.Dedup.ccDriverMaxEdges = 0L
      val ccDist = graft.dedup.Dedup.connectedComponents(pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(ccDist === expected)
    } finally graft.dedup.Dedup.ccDriverMaxEdges = prev
  }
}
