package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.index.PostingsBuilder
import graft.io.TableIO
import graft.query.Searcher
import graft.web.{WebIndex, WebtextGen}

/** Structured-Streaming incremental ingest: streamed appends must yield
  * BM25 scores identical to a one-shot batch build over the union corpus
  * (docIDs differ — assignment is layout-dependent — so the comparison is on
  * per-query rank→score sequences), and replays must be exactly-once. */
class StreamSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val cfg = PostingsBuilder.Config(shardSize = 256)
  private val queries = Seq(1 -> "w1 w2", 2 -> "w3 w17 w23", 3 -> "w5 w100")
  private def root = s"${sys.props("user.dir")}/target/test-stream"

  // unique urls (huge nDocs disables the generator's recrawl aliasing)
  private def docsRange(lo: Long, hi: Long) = {
    import spark.implicits._
    spark.range(lo, hi, 1, 4).mapPartitions(_.map(i =>
      WebtextGen.rowFor(i, 1000000L))).toDF()
  }

  test("streamed appends are score-identical to a batch build; replays are no-ops") {
    new TableIO(root).deleteAll()
    Files.createDirectories(Paths.get(s"$root/in"))

    // base index over docs [0, 1000)
    val idxDir = s"$root/idx"
    WebIndex.build(spark, docsRange(0, 1000), idxDir, cfg)

    // stream two files of new docs (must be FLAT files in the watched dir —
    // the file-stream source ignores non-partition subdirectories)
    def writeFlat(lo: Long, hi: Long, name: String): Unit = {
      val tmp = s"$root/tmp-$name"
      docsRange(lo, hi).coalesce(1).write.parquet(tmp)
      val part = Files.list(Paths.get(tmp)).filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
      Files.move(part, Paths.get(s"$root/in/$name"))
      new TableIO(tmp).deleteAll()
    }
    writeFlat(1000, 1500, "f1.parquet")
    writeFlat(1500, 2000, "f2.parquet")
    val q = graft.streaming.IncrementalIndexer.start(
      spark, s"$root/in", idxDir, s"$root/ckpt", cfg)
    q.processAllAvailable()
    q.stop()

    // reference: one-shot batch build over the union corpus
    val refDir = s"$root/idx-ref"
    WebIndex.build(spark, docsRange(0, 2000), refDir, cfg)

    def scores(dir: String): Map[Long, Seq[Long]] =
      Searcher.search(spark, dir, queries, 10).collect()
        .groupBy(_.getLong(0))
        .map { case (qid, rs) =>
          qid -> rs.sortBy(_.getLong(1)).map(_.getLong(3)).toSeq
        }
    assert(scores(idxDir) === scores(refDir))

    // stats merged exactly
    val a = spark.read.parquet(s"$idxDir/stats").collect()(0)
    val b = spark.read.parquet(s"$refDir/stats").collect()(0)
    assert(a.getAs[Long]("n_docs") === b.getAs[Long]("n_docs"))
    assert(a.getAs[Long]("total_dl") === b.getAs[Long]("total_dl"))
    assert(a.getAs[Double]("avgdl") === b.getAs[Double]("avgdl"))

    // replaying an already-committed batch is a no-op
    val before = spark.read.parquet(s"$idxDir/doc_lens").count()
    graft.streaming.IncrementalIndexer.ingestBatch(
      spark, docsRange(1000, 1500), idxDir, 0L, cfg)
    assert(spark.read.parquet(s"$idxDir/doc_lens").count() === before)

    // the index advertises streamed groups (searcher switches to safe bounds)
    assert(new TableIO(idxDir).committedSteps().exists(_.startsWith("stream_")))
  }
}
