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

  // ---- match_phrase_prefix (MultiPhrase kernel) ---------------------------

  /** Raw query = fixed tokens + a trailing prefix string. Both sides
    * analyze identically; the last ANALYZED occurrence expands over the
    * corpus dictionary (term order, capped) — a trailing stopword prefix
    * is dropped by the chain, making an earlier token the expanded one
    * (the engine's rule), and a prefix matching only stopwords expands to
    * nothing (stopwords never reach the dictionary). */
  private val prefixGen: Gen[String] =
    Gen.oneOf("a", "aa", "b", "bb", "c", "cc", "d", "dd", "t", "th",
      "the", "o", "of")

  private val fixedGen: Gen[List[String]] =
    Gen.listOf(Gen.oneOf(vocab)).map(_.take(2))

  /** (slots, sumIdf) under MultiPhrasePrefixQuery semantics, or None when
    * the query matches nothing by construction (absent fixed term / empty
    * expansion / analyzed-to-nothing). Shared by brute and kernel so the
    * property tests the KERNEL (union slots, merged positions, leapfrog),
    * not the trivial dictionary filter. */
  private def prefixQueryPlan(docs: Seq[(Int, Map[String, (Int, Array[Int])])],
      raw: String, maxExp: Int)
      : Option[(Array[(Array[String], Int)], Double)] = {
    val occs = Analyzer.analyzeChainPos(Analyzer.TextStop, raw)
    if (occs.isEmpty) return None
    val n = docs.length.toLong
    def df(t: String): Long = docs.count(_._2.contains(t)).toLong
    val fixed = occs.dropRight(1)
    if (fixed.exists(o => df(o._1) == 0)) return None
    val (lastTerm, lastPos) = occs.last
    val dict = docs.iterator.flatMap(_._2.keys).toSeq.distinct.sorted
    val exps = dict.filter(_.startsWith(lastTerm)).take(maxExp)
    if (exps.isEmpty) return None
    val slots: Array[(Array[String], Int)] =
      fixed.map { case (t, p) => (Array(t), p) } :+
        (exps.toArray, lastPos)
    val sumIdf =
      fixed.iterator.map(o => Bm25.idf(n, df(o._1))).sum +
        exps.iterator.map(t => Bm25.idf(n, df(t))).sum
    Some((slots, sumIdf))
  }

  private def brutePrefix(corpus: Seq[Seq[Seq[String]]], raw: String,
      k: Int, maxExp: Int): Seq[(Long, Long)] = {
    val docs = corpus.map(analyzed)
    prefixQueryPlan(docs, raw, maxExp) match {
      case None => Nil
      case Some((slots, sumIdf)) =>
        val n = docs.length.toLong
        val avgdl = if (n == 0) 0.0 else docs.map(_._1).sum.toDouble / n
        val base = slots(0)._2
        docs.zipWithIndex.flatMap { case ((dl, terms), id) =>
          // union positions per slot; conjunction requires every slot on-doc
          val slotPos: Array[Array[Int]] = slots.map { case (ts, _) =>
            ts.flatMap(t => terms.get(t).map(_._2).getOrElse(Array.empty[Int]))
              .distinct.sorted
          }
          if (slotPos.exists(_.isEmpty)) None
          else {
            val pf = slotPos(0).count(s => slots.indices.forall { j =>
              slotPos(j).contains(s + (slots(j)._2 - base))
            })
            if (pf == 0) None
            else Some((id.toLong, math.round(
              sumIdf * Bm25.tfNorm(pf.toDouble, dl.toDouble, avgdl) * 1e6)))
          }
        }.sortBy { case (id, x6) => (-x6, id) }.take(k)
    }
  }

  private def kernelPrefix(corpus: Seq[Seq[Seq[String]]], raw: String,
      k: Int, maxExp: Int, shardSize: Int, blockSize: Int): Seq[(Long, Long)] = {
    val docs = corpus.map(analyzed)
    prefixQueryPlan(docs, raw, maxExp) match {
      case None => Nil
      case Some((slots, sumIdf)) =>
        val n = docs.length.toLong
        val avgdl = if (n == 0) 0.0 else docs.map(_._1).sum.toDouble / n
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
          Phrase.scoreShardMulti(t => blocks.getOrElse(t, null),
            slots, sumIdf, avgdl, k)
            .map { case (d, s) => (d, math.round(s * 1e6)) }.toSeq
        }.sortBy { case (id, x6) => (-x6, id) }.take(k)
    }
  }

  test("multi-phrase (prefix) kernel == brute-force union-slot scorer") {
    val p = Prop.forAll(corpusGen, fixedGen, prefixGen,
      Gen.oneOf(1, 3, 10), Gen.oneOf(1, 2, 50), Gen.oneOf(3, 8, 64)) {
      (corpus, fixed, prefix, k, maxExp, shardSize) =>
        val raw = (fixed :+ prefix).mkString(" ")
        brutePrefix(corpus, raw, k, maxExp) ==
          kernelPrefix(corpus, raw, k, maxExp, shardSize, blockSize = 2)
    }
    check("multi-phrase-prefix-exactness", p)
  }
}
