package graft.tools

import org.apache.spark.sql.SparkSession

import graft.index.{FieldedIndex, PostingsBuilder}
import graft.io.TableIO

/** A/B probe for the multi-leg bool paths: combined-bound WAND
  * ([[FieldedIndex.multiMatch]]) vs the naive full-decode twin
  * ([[FieldedIndex.multiMatchNaive]]) on a fielded index at scale, with a
  * high-df leg (a year cohort ≈ N/30 docs) plus corpus-wide common tokens
  * in the text leg — the exact shape the round-3 verdict flagged.
  *
  * `runMain graft.tools.MultiMatchProbe [nDocs] [cores]` — reuses the
  * [[FieldedProfile]] synthetic corpus/index. Protocol per BASELINE.md's
  * variance study: arms interleaved × 3 rounds, compare per-arm MINIMA
  * (contention on this host only slows runs). */
object MultiMatchProbe {

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 1000000L
    val cores = if (args.length > 1) args(1).toInt else 32
    val spark = SparkSession.builder().master(s"local[$cores]")
      .appName("multimatch-probe")
      .config("spark.sql.shuffle.partitions", (cores * 2).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val src = s"${sys.props("user.dir")}/target/fielded-profile/src$n"
    if (!new java.io.File(s"$src/_SUCCESS").exists())
      FieldedProfile.corpus(spark, n).write.mode("overwrite").parquet(src)
    val dir = s"${sys.props("user.dir")}/target/fielded-profile/idx-ab$n"
    if (!FieldedIndex.isComplete(dir)) {
      new TableIO(dir).deleteAll()
      FieldedIndex.build(spark, spark.read.parquet(src), dir,
        FieldedIndex.CrossrefMapping, keyCol = "DOI",
        PostingsBuilder.Config(shardSize = 65536))
    }

    def spec(f: String) = FieldedIndex.CrossrefMapping.find(_.field == f).get
    // the flagged shape: common tokens (record/title/journal → df = N) in
    // the text leg + a year cohort (df ≈ N/30) + a volume cohort (df ≈ N/50)
    val legs = Seq(
      spec("bibliographic") -> "fam123456 Record 123456 title Journal 456",
      spec("year") -> "1993",
      spec("volume") -> "23")
    val fm = (spec("title"), "second title 123456", spec("year"), Seq("1993"))

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    // untimed warm of both arms (opens handles, JITs kernels, fills caches)
    FieldedIndex.multiMatchNaive(spark, dir, legs, 10).count()
    FieldedIndex.multiMatch(spark, dir, legs, 10).count()
    FieldedIndex.filteredMatchNaive(spark, dir, fm._1, fm._2, fm._3, fm._4, 10).count()
    FieldedIndex.filteredMatch(spark, dir, fm._1, fm._2, fm._3, fm._4, 10).count()

    var (mmN, mmK, flN, flK) =
      (Double.MaxValue, Double.MaxValue, Double.MaxValue, Double.MaxValue)
    for (r <- 1 to 3) {
      val a = time(FieldedIndex.multiMatchNaive(spark, dir, legs, 10).count())
      val b = time(FieldedIndex.multiMatch(spark, dir, legs, 10).count())
      val c = time(FieldedIndex.filteredMatchNaive(spark, dir,
        fm._1, fm._2, fm._3, fm._4, 10).count())
      val d = time(FieldedIndex.filteredMatch(spark, dir,
        fm._1, fm._2, fm._3, fm._4, 10).count())
      mmN = math.min(mmN, a); mmK = math.min(mmK, b)
      flN = math.min(flN, c); flK = math.min(flK, d)
      System.err.println(
        f"[ab r$r] multiMatch naive=$a%.3fs kernel=$b%.3fs | filtered naive=$c%.3fs kernel=$d%.3fs")
    }
    // phrase latency at the same scale (positions tier; title field):
    // a mass-tie phrase and a discriminative one
    val title = spec("title")
    val phrases = Seq(1 -> "second title", 2 -> "title 123456")
    FieldedIndex.phraseMatch(spark, dir, title, phrases, 10).count() // warm
    var ph = Double.MaxValue
    for (_ <- 1 to 3)
      ph = math.min(ph,
        time(FieldedIndex.phraseMatch(spark, dir, title, phrases, 10).count()))
    System.err.println(f"[ab phrase] docs=$n 2-phrase batch min=$ph%.3fs")

    // bool-with-phrase (phrase clause as a WAND cursor): citation leg +
    // mass phrase ("second title" matches every doc, pf=1 — the hardest
    // pruning shape) vs the naive full-decode twin
    val bpLegs = Seq(spec("bibliographic") ->
      "fam123456 Record 123456 title Journal 456")
    val bpPhrase = Seq(title -> "second title")
    FieldedIndex.boolQueryNaive(spark, dir, bpLegs, bpPhrase, 10).count() // warm
    FieldedIndex.boolQuery(spark, dir, bpLegs, bpPhrase, 10).count()
    var (bpN, bpK) = (Double.MaxValue, Double.MaxValue)
    for (r <- 1 to 3) {
      val a = time(FieldedIndex.boolQueryNaive(spark, dir, bpLegs, bpPhrase, 10).count())
      val b = time(FieldedIndex.boolQuery(spark, dir, bpLegs, bpPhrase, 10).count())
      bpN = math.min(bpN, a); bpK = math.min(bpK, b)
      System.err.println(f"[ab r$r] boolPhrase naive=$a%.3fs kernel=$b%.3fs")
    }
    System.err.println(
      f"[ab boolPhrase] docs=$n naive=$bpN%.3fs kernel=$bpK%.3fs (${bpN / bpK}%.2fx)")

    // sanity: identical results
    val kr = FieldedIndex.multiMatch(spark, dir, legs, 10).collect().toSeq
    val nr = FieldedIndex.multiMatchNaive(spark, dir, legs, 10).collect().toSeq
    require(kr == nr, s"rank mismatch:\n$kr\n$nr")
    val bkr = FieldedIndex.boolQuery(spark, dir, bpLegs, bpPhrase, 10).collect().toSeq
    val bnr = FieldedIndex.boolQueryNaive(spark, dir, bpLegs, bpPhrase, 10).collect().toSeq
    require(bkr == bnr, s"boolPhrase rank mismatch:\n$bkr\n$bnr")
    System.err.println(
      f"[ab min] docs=$n multiMatch naive=$mmN%.3fs kernel=$mmK%.3fs (${mmN / mmK}%.2fx) | " +
      f"filtered naive=$flN%.3fs kernel=$flK%.3fs (${flN / flK}%.2fx)")
    spark.stop()
  }
}
