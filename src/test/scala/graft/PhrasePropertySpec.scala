package graft

import scala.jdk.CollectionConverters._

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.analysis.Analyzer
import graft.index.PostingsBuilder
import graft.model.{PostingBlock, TfRow}
import graft.query.{Bm25, Phrase}

/** Randomized exactness property for the phrase kernel: random multi-valued
  * corpora (stopwords included, so position gaps and the multi-value
  * increment gap appear everywhere) indexed through the REAL position
  * pipeline (chainCountsPos → TfRow.pos → block codec), then
  * [[Phrase.scoreShard]] must reproduce a brute-force alignment scorer
  * exactly under the deterministic ordering — leapfrog, lazy position
  * decode, block boundaries, repeated phrase terms, and single-term
  * phrases all land in the same property. */
class PhrasePropertySpec extends AnyFunSuite {

  private def check(name: String, p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, s"$name: ${res.status}")
  }

  // "the"/"of" are _english_ stopwords → dropped with gaps kept
  private val vocab = Seq("aa", "bb", "cc", "dd", "the", "of")

  /** doc = values = token lists; rendered as space-joined strings. */
  private val docGen: Gen[Seq[Seq[String]]] = for {
    nv <- Gen.chooseNum(1, 3)
    vals <- Gen.listOfN(nv, Gen.listOf(Gen.oneOf(vocab)).map(_.take(8)))
  } yield vals

  private val corpusGen: Gen[Seq[Seq[Seq[String]]]] = for {
    n <- Gen.chooseNum(1, 40)
    docs <- Gen.listOfN(n, docGen)
  } yield docs

  private val phraseGen: Gen[String] =
    Gen.nonEmptyListOf(Gen.oneOf(vocab)).map(_.take(3).mkString(" "))

  /** Per-doc analysis through the real chain (dl, term → (tf, positions)). */
  private def analyzed(doc: Seq[Seq[String]])
      : (Int, Map[String, (Int, Array[Int])]) = {
    val (dl, accs) = Analyzer.chainCountsPos(Analyzer.TextStop,
      doc.iterator.map(_.mkString(" ")))
    (dl, accs.entrySet().asScala
      .map(e => e.getKey -> ((e.getValue.tf, e.getValue.positions))).toMap)
  }

  private def brute(corpus: Seq[Seq[Seq[String]]], phrase: String, k: Int)
      : Seq[(Long, Long)] = {
    val occs = Analyzer.analyzeChainPos(Analyzer.TextStop, phrase)
    if (occs.isEmpty) return Nil
    val docs = corpus.map(analyzed)
    val n = docs.length.toLong
    val df = occs.map(_._1).distinct.map(t =>
      t -> docs.count(_._2.contains(t)).toLong).toMap
    if (occs.exists(o => df(o._1) == 0)) return Nil
    val avgdl = if (n == 0) 0.0 else docs.map(_._1).sum.toDouble / n
    val sumIdf = occs.iterator.map(o => Bm25.idf(n, df(o._1))).sum
    val base = occs(0)._2
    docs.zipWithIndex.flatMap { case ((dl, terms), id) =>
      if (occs.exists(o => !terms.contains(o._1))) None
      else {
        val lead = terms(occs(0)._1)._2
        val pf = lead.count(s => occs.forall { case (t, p) =>
          terms(t)._2.contains(s + (p - base))
        })
        if (pf == 0) None
        else Some((id.toLong,
          math.round(sumIdf * Bm25.tfNorm(pf.toDouble, dl.toDouble, avgdl) * 1e6)))
      }
    }.sortBy { case (id, x6) => (-x6, id) }.take(k)
  }

  private def kernel(corpus: Seq[Seq[Seq[String]]], phrase: String, k: Int,
      shardSize: Int, blockSize: Int): Seq[(Long, Long)] = {
    val occs = Analyzer.analyzeChainPos(Analyzer.TextStop, phrase)
    if (occs.isEmpty) return Nil
    val docs = corpus.map(analyzed)
    val n = docs.length.toLong
    val df = occs.map(_._1).distinct.map(t =>
      t -> docs.count(_._2.contains(t)).toLong).toMap
    if (occs.exists(o => df(o._1) == 0)) return Nil
    val avgdl = if (n == 0) 0.0 else docs.map(_._1).sum.toDouble / n
    val sumIdf = occs.iterator.map(o => Bm25.idf(n, df(o._1))).sum

    // encode through the positions pipeline, sharded by doc_id
    val rows = docs.zipWithIndex.flatMap { case ((dl, terms), id) =>
      terms.toSeq.sortBy(_._1).map { case (t, (tf, pos)) =>
        TfRow(id / shardSize, t, id.toLong, tf, dl, pos)
      }
    }
    val byShard: Map[Int, Map[String, Array[PostingBlock]]] =
      rows.groupBy(_.doc_shard).map { case (shard, rs) =>
        val sorted = rs.sortBy(r => (r.term, r.doc_id))
        val blocks = PostingsBuilder.encodePartition(avgdl, blockSize)(
          sorted.iterator).toIndexedSeq
        shard -> blocks.groupBy(_.term).view
          .mapValues(_.sortBy(_.block_id).toArray).toMap
      }
    byShard.toSeq.sortBy(_._1).flatMap { case (_, blocks) =>
      Phrase.scoreShard(t => blocks.getOrElse(t, null),
        occs, sumIdf, avgdl, k)
        .map { case (d, s) => (d, math.round(s * 1e6)) }.toSeq
    }.sortBy { case (id, x6) => (-x6, id) }.take(k)
  }

  test("phrase kernel == brute-force alignment scorer on random corpora") {
    val p = Prop.forAll(corpusGen, phraseGen, Gen.oneOf(1, 3, 10),
      Gen.oneOf(3, 8, 64), Gen.oneOf(2, 4)) {
      (corpus, phrase, k, shardSize, blockSize) =>
        brute(corpus, phrase, k) ==
          kernel(corpus, phrase, k, shardSize, blockSize)
    }
    check("phrase-exactness", p)
  }
}
