package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.analysis.Analyzer
import graft.harness.QuerySet
import graft.index.{FieldedIndex, PostingsBuilder}
import graft.io.TableIO
import graft.query.Searcher
import graft.web.WebtextGen

/** 20M-doc scale probe (round-4 verdict ask #9): one more doubling past
  * the 9.6M datapoint, WITH the positions tier on — the fielded TextStop
  * chain over the full webtext body — so the flat-latency claim is
  * re-checked as the index outgrows page cache. Reports build docs/s,
  * searcher-open wall, match p50/p95 over the 20-query webtext mix, and
  * phrase p50/p95 (the positions tier actually read at query time).
  *
  * `runMain graft.tools.ScaleProbe [nDocs] [cores]` — defaults 20M / 32.
  * Run with SPARK_DRIVER_MEM=96g: the resident handle holds the postings
  * + positions of a 2.5B-token corpus.
  */
object ScaleProbe {

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 20000000L
    val cores = if (args.length > 1) args(1).toInt else 32
    val spark = SparkSession.builder().master(s"local[$cores]")
      .appName("scale-probe")
      .config("spark.sql.shuffle.partitions", (cores * 2).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (32 << 20).toString)
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        (64 << 20).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", s"${sys.props("user.dir")}/target/tmp")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def now() = System.nanoTime()
    def secs(t0: Long) = (now() - t0) / 1e9

    // stage the corpus untimed (the input table exists before any build)
    val src = s"${sys.props("user.dir")}/target/scale-probe/src$n"
    if (!new java.io.File(s"$src/_SUCCESS").exists())
      WebtextGen.generateDf(spark, n, 512)
        .select(col("url"), col("text"))
        .write.mode("overwrite").parquet(src)

    val dir = s"${sys.props("user.dir")}/target/scale-probe/idx"
    new TableIO(dir).deleteAll()
    val spec = FieldedIndex.FieldSpec("text", Analyzer.TextStop)
    val docs = spark.read.parquet(src)
    val tB = now()
    FieldedIndex.build(spark, docs, dir, Seq(spec), keyCol = "url",
      PostingsBuilder.Config(shardSize = 65536))
    val buildWall = secs(tB)
    System.err.println(f"[scale] build docs=$n wall=$buildWall%.1fs " +
      f"docs_per_sec=${n / buildWall}%.0f (positions tier ON)")

    val fdir = FieldedIndex.fieldDir(dir, "text")
    val tO = now()
    val handle = Searcher.open(spark, fdir)
    val openWall = secs(tO)
    System.err.println(f"[scale] open wall=$openWall%.1fs")

    // match latency: one untimed warm pass, then per-query timing
    val qs = QuerySet.webQueries
    qs.foreach(q => Searcher.search(handle, Seq(q), QuerySet.K).count())
    def pct(xs: Seq[Double], p: Double) =
      xs.sorted.apply(math.min(xs.length - 1, (xs.length * p).toInt))
    val matchMs = qs.map { q =>
      val t = now(); Searcher.search(handle, Seq(q), QuerySet.K).count()
      secs(t) * 1000.0
    }
    System.err.println(f"[scale] match p50=${pct(matchMs, 0.5)}%.1fms " +
      f"p95=${pct(matchMs, 0.95)}%.1fms")

    // phrase latency (positions tier read): adjacent Zipf heads + a
    // mid-tail pair, through the standard phrase kernel
    val phrases = Seq("w1 w2", "w2 w1", "w3 w7", "w42 w777", "w10 w20")
    phrases.foreach(p =>
      FieldedIndex.phraseMatch(spark, dir, spec, Seq(1 -> p), QuerySet.K)
        .count())
    val phraseMs = phrases.map { p =>
      val t = now()
      FieldedIndex.phraseMatch(spark, dir, spec, Seq(1 -> p), QuerySet.K)
        .count()
      secs(t) * 1000.0
    }
    System.err.println(f"[scale] phrase p50=${pct(phraseMs, 0.5)}%.1fms " +
      f"max=${phraseMs.max}%.1fms (${phrases.size} phrase queries)")

    // span_near latency (ordered + unordered at slop 2): same conjunction
    // cost class as phrases — the proximity window only changes the
    // per-candidate position arithmetic, never which blocks decode
    val spans = Seq("w1 w2", "w3 w7", "w42 w777")
    spans.foreach { p =>
      FieldedIndex.spanNear(spark, dir, spec, Seq((1, p, 2)), QuerySet.K)
        .count()
      FieldedIndex.spanNear(spark, dir, spec, Seq((1, p, 2)), QuerySet.K,
        inOrder = false).count()
    }
    val spanMs = spans.map { p =>
      val t = now()
      FieldedIndex.spanNear(spark, dir, spec, Seq((1, p, 2)), QuerySet.K)
        .count()
      secs(t) * 1000.0
    }
    val spanUMs = spans.map { p =>
      val t = now()
      FieldedIndex.spanNear(spark, dir, spec, Seq((1, p, 2)), QuerySet.K,
        inOrder = false).count()
      secs(t) * 1000.0
    }
    System.err.println(f"[scale] span_near p50=${pct(spanMs, 0.5)}%.1fms " +
      f"max=${spanMs.max}%.1fms unordered p50=${pct(spanUMs, 0.5)}%.1fms " +
      f"max=${spanUMs.max}%.1fms")

    val postingsBytes = spark.read.parquet(s"$fdir/lineage")
      .agg(org.apache.spark.sql.functions.sum("postings_bytes"))
      .head().getLong(0)
    System.err.println(f"[scale] postings=${postingsBytes / 1048576.0}%.0fMB")
    handle.close()
    spark.stop()
  }
}
