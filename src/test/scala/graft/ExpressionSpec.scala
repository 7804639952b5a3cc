package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analysis.{Analyzer, AnalyzeStopExpr}
import graft.index.TextIndex

/** The native Catalyst analysis expression: semantics identical to the UDF /
  * pure function, SQL-registrable, null-safe, and codegen-compatible. */
class ExpressionSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val samples = Seq(
    "The quick and the dead",
    "Åström's Naïve Café r&d <tag>",
    "", "a the an and", "w1 w2 w3 \"w9\"")

  test("expression output equals the UDF and the pure function") {
    val df = samples.toDF("text")
    val got = df.select(
      TextIndex.analyzeStopCol(col("text")).as("e"),
      TextIndex.analyzeStopUdf(col("text")).as("u")).collect()
    for ((r, s) <- got.zip(samples)) {
      assert(r.getAs[scala.collection.Seq[String]]("e").toSeq === Analyzer.analyzeStop(s).toSeq)
      assert(r.getAs[scala.collection.Seq[String]]("e").toSeq === r.getAs[scala.collection.Seq[String]]("u").toSeq)
    }
  }

  test("null propagates to null") {
    val df = Seq[Option[String]](None, Some("x y")).toDF("text")
    val rows = df.select(TextIndex.analyzeStopCol(col("text"))).collect()
    assert(rows(0).isNullAt(0))
    assert(rows(1).getAs[scala.collection.Seq[String]](0).toSeq === Seq("x", "y"))
  }

  test("registered SQL function works") {
    AnalyzeStopExpr.register(spark)
    samples.toDF("text").createOrReplaceTempView("t")
    val viaSql = spark.sql("SELECT graft_analyze_stop(text) AS toks FROM t")
      .collect().map(_.getAs[scala.collection.Seq[String]]("toks").toSeq)
    assert(viaSql.toSeq === samples.map(Analyzer.analyzeStop(_).toSeq))
  }

  test("expression participates in whole-stage codegen") {
    // must use a real scan: a literal local relation gets constant-folded
    // into LocalTableScan before codegen ever runs
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val df = docs.select(size(TextIndex.analyzeStopCol(col("text"))).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    // the `*(n)` prefix marks whole-stage-codegen stages in the string form
    assert(plan.contains("*(1) Project [size(graft_analyze_stop"), plan)
    // and the value the generated code computes matches the pure function
    val viaPlan = df.agg(sum("n")).collect()(0).getLong(0)
    val viaScala = docs.collect()
      .map(r => Analyzer.analyzeStop(r.getAs[String]("text")).length.toLong).sum
    assert(viaPlan === viaScala)
  }

  test("type check rejects non-string input") {
    val ex = intercept[Exception] {
      Seq(1, 2).toDF("x").select(TextIndex.analyzeStopCol(col("x"))).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("string") ||
      ex.getMessage.contains("DATATYPE_MISMATCH"))
  }
}
