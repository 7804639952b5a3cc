package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.index.{DocIds, PostingsBuilder}
import graft.io.TableIO
import graft.multimodal.Multimodal
import graft.query.Searcher
import graft.web.{HtmlExtract, WebIndex, WebtextGen}

/** Webtext path tests: the per-url byte-identity extraction invariant
  * (BASELINE.json input_hint), LWW dedup, dense id assignment, end-to-end
  * index build + query over the input_hint schema, generator determinism,
  * and the multimodal plumbing. */
class WebSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val N = 2000L

  test("per-url invariant: extract(html) is byte-identical to text") {
    val docs = WebtextGen.generateDf(spark, N, 8)
    val mismatches = docs
      .withColumn("extracted", HtmlExtract.extractCol(col("html")))
      .filter(col("extracted") =!= col("text"))
      .count()
    assert(mismatches === 0L)
  }

  test("extractor goldens: tags, entities, script/style dropped") {
    def x(s: String) = HtmlExtract.extract(s.getBytes("UTF-8"))
    assert(x("<p>a</p><p>b</p>") === "a b")
    assert(x("<b>bold</b> text") === "bold text")
    assert(x("a &amp; b &lt;c&gt; &quot;d&quot;") === "a & b <c> \"d\"")
    assert(x("<script>var x = '<p>';</script>hi<style>p{}</style>") === "hi")
    assert(x("") === "")
    assert(x("no tags") === "no tags")
    assert(HtmlExtract.extract(null) === "")
  }

  test("generator is deterministic and Zipf-skewed") {
    def corpusSig() = WebtextGen.generateDf(spark, 500, 4)
      .select(xxhash64(concat_ws("|", col("url"), col("text"), col("lang"))).as("h"),
        length(col("text")).as("len"))
      .agg(sum(pmod(col("h"), lit(1000000007L))).as("hs"),
        sum(col("len")).as("ls")).collect()(0)
    val a = corpusSig()
    val b = corpusSig()
    assert(a === b)
    // head term dominates: w1 much more frequent than w5000
    val tf = WebtextGen.generateDf(spark, 500, 4)
      .select(explode(split(col("text"), " ")).as("t"))
      .groupBy("t").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tf.getOrElse("w1", 0L) > 20L * tf.getOrElse("w5000", 1L))
  }

  test("LWW dedup keeps the latest crawl of each url") {
    val docs = WebtextGen.generateDf(spark, N, 8)
    val deduped = WebIndex.extractAndDedup(docs)
    assert(deduped.count() === deduped.select("url").distinct().count())
    // a recrawled url keeps its max warc_ts
    val maxTs = docs.groupBy("url").agg(max("warc_ts").as("m"))
    val joined = deduped.join(maxTs, "url")
      .filter(col("warc_ts") =!= col("m")).count()
    assert(joined === 0L)
  }

  test("dense doc ids: 0..n-1, unique") {
    val deduped = WebIndex.extractAndDedup(WebtextGen.generateDf(spark, N, 8))
    val ids = DocIds.assign(deduped.select("url")).select("doc_id")
    val n = ids.count()
    assert(ids.distinct().count() === n)
    val mm = ids.agg(min("doc_id"), max("doc_id")).collect()(0)
    assert(mm.getLong(0) === 0L)
    assert(mm.getLong(1) === n - 1)
  }

  test("end-to-end: build webtext index, query it, resume is a no-op") {
    val dir = s"${sys.props("user.dir")}/target/test-idx/web"
    new TableIO(dir).deleteAll()
    val docs = WebtextGen.generateDf(spark, N, 8)
    WebIndex.build(spark, docs, dir,
      PostingsBuilder.Config(shardSize = 256, shardGroups = 2))
    assert(PostingsBuilder.isComplete(dir))

    // head terms must rank: query the two most frequent vocabulary words
    val hits = Searcher.search(spark, dir, Seq(1 -> "w1 w2", 2 -> "w17 w23"), 10)
      .collect()
    assert(hits.length > 0)
    assert(hits.map(_.getLong(0)).toSet === Set(1L, 2L))
    // doc_map join resolves every hit back to a url
    val dm = spark.read.parquet(s"$dir/doc_map")
    val withUrl = Searcher.search(spark, dir, Seq(1 -> "w1 w2"), 10)
      .join(dm, "doc_id")
    assert(withUrl.filter(col("url").isNull).count() === 0L)
    assert(withUrl.count() === 10L)

    // idempotent re-run
    val io = new TableIO(dir)
    val snap = io.currentSnapshotId()
    WebIndex.build(spark, docs, dir,
      PostingsBuilder.Config(shardSize = 256, shardGroups = 2))
    assert(io.currentSnapshotId() === snap)
  }

  test("multimodal plumbing: features, resize, frame sampling") {
    val media = Multimodal.generate(spark, 300, 4)
    val feats = Multimodal.extractFeatures(media)
    val rows = feats.collect()
    assert(rows.length === 300)
    for (f <- rows) {
      assert(f.feature.length === 16)
      val s = f.feature.sum
      assert(math.abs(s - 1f) < 1e-3, s"histogram not normalized: $s")
    }
    // resize caps image dims, leaves audio/video alone
    val resized = Multimodal.resize(media, 128).collect()
    for (r <- resized if r.kind == "image")
      assert(math.max(r.meta.width, r.meta.height) <= 128)
    // frame sampling: one row per everyMs of duration
    val frames = Multimodal.frameSample(media, 1000L).collect()
    assert(frames.nonEmpty)
    val byId = frames.groupBy(_.media_id)
    val durations = media.filter(_.kind == "video").collect()
      .map(r => r.media_id -> r.meta.duration_ms).toMap
    for ((id, fs) <- byId)
      assert(fs.length === math.max(1, (durations(id) / 1000L).toInt))
    // determinism
    val again = Multimodal.extractFeatures(Multimodal.generate(spark, 300, 4))
      .collect().map(f => f.media_id -> f.feature.toSeq).toMap
    for (f <- rows) assert(again(f.media_id) === f.feature.toSeq)
  }
}
