package graft.tools

import org.apache.spark.sql.SparkSession

import graft.index.{FieldedIndex, PostingsBuilder}
import graft.io.TableIO

/** A/B probe for the fuzzy-candidate sidecar vs the retired full-vocab
  * Damerau sweep (`graft.fuzzy.sweep=1` re-enables the sweep arm): term
  * suggester and fuzzy match against the title sub-index, whose dictionary
  * is vocabulary-sized in nDocs (every doc contributes a distinct numeric
  * token), so the sweep's per-query cost grows with the corpus while the
  * sidecar's tracks the ±e length bands with an O(1) mask test per banded
  * term and DP only on mask-plausible survivors.
  *
  * `runMain graft.tools.FuzzyProbe [nDocs] [cores]` — reuses
  * [[MultiMatchProbe]]'s index directory. Protocol per BASELINE.md's
  * variance study: 3 rounds, per-arm MINIMA. Asserts hash-identical
  * results between the arms before reporting. */
object FuzzyProbe {

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 1000000L
    val cores = if (args.length > 1) args(1).toInt else 32
    val spark = SparkSession.builder().master(s"local[$cores]")
      .appName("fuzzy-probe")
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
    val title = FieldedIndex.CrossrefMapping.find(_.field == "title").get

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    // misspelled forms of the corpus words plus a numeric-ish typo:
    // every budget (1 and 2 edits) and a digit-band query are exercised
    val suggestText = "secomd titel recrod"
    val fuzzyQs = Seq(1 -> "secomd titel", 2 -> "recrod 123457")

    def runArm(sweep: Boolean): (Double, Double, Seq[String], Seq[String]) = {
      sys.props("graft.fuzzy.sweep") = if (sweep) "1" else "0"
      // warm (also builds the sidecar lazily in the non-sweep arm)
      FieldedIndex.termSuggest(spark, dir, title, suggestText, 5).count()
      FieldedIndex.fuzzyMatch(spark, dir, title, fuzzyQs, 10).count()
      var (sg, fz) = (Double.MaxValue, Double.MaxValue)
      for (_ <- 1 to 3) {
        sg = math.min(sg, time(
          FieldedIndex.termSuggest(spark, dir, title, suggestText, 5).count()))
        fz = math.min(fz, time(
          FieldedIndex.fuzzyMatch(spark, dir, title, fuzzyQs, 10).count()))
      }
      val sgRows = FieldedIndex.termSuggest(spark, dir, title, suggestText, 5)
        .collect().map(_.toSeq.mkString(",")).toSeq
      val fzRows = FieldedIndex.fuzzyMatch(spark, dir, title, fuzzyQs, 10)
        .collect().map(_.toSeq.mkString(",")).toSeq
      (sg, fz, sgRows, fzRows)
    }

    val (sgSweep, fzSweep, sgR1, fzR1) = runArm(sweep = true)
    val (sgSide, fzSide, sgR2, fzR2) = runArm(sweep = false)
    require(sgR1 == sgR2, s"suggest mismatch:\n$sgR1\n$sgR2")
    require(fzR1 == fzR2, s"fuzzy mismatch:\n$fzR1\n$fzR2")
    System.err.println(
      f"[fuzzy-ab] docs=$n suggest sweep=$sgSweep%.3fs sidecar=$sgSide%.3fs " +
        f"(${sgSweep / sgSide}%.2fx) | fuzzy sweep=$fzSweep%.3fs " +
        f"sidecar=$fzSide%.3fs (${fzSweep / fzSide}%.2fx) | results identical")
    spark.stop()
  }
}
