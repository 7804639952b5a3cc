package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.analysis.Analyzer
import graft.spark.GraftExtensions
import graft.text.HashKernels
import org.apache.spark.unsafe.types.UTF8String

/** SQL-surface parity: every function GraftExtensions registers must
  * return exactly what the Column API / kernel functions return — the SQL
  * route is the same Catalyst expression, not a reimplementation. */
class ExtensionsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // tests share one JVM-wide session, so the build-time extension route
    // may not have applied — the running-session route must work too
    GraftExtensions.registerAll(s)
    s
  }

  test("SQL functions evaluate the same kernels as the Column API") {
    import spark.implicits._
    Seq(("The quick brown Fox jumps över the lazy dog", 1L))
      .toDF("text", "id").createOrReplaceTempView("t")

    val row = spark.sql(
      """SELECT graft_analyze_stop(text) AS toks,
        |       graft_poly_hash(text) AS ph,
        |       graft_sim_hash(text) AS sh,
        |       graft_fingerprint(text) AS fp,
        |       graft_minhash_sig(text) AS mh,
        |       graft_analyze_tf(text).dl AS dl
        |FROM t""".stripMargin).head()
    val text = "The quick brown Fox jumps över the lazy dog"
    assert(row.getAs[Seq[String]]("toks") === Analyzer.analyzeStop(text).toSeq)
    assert(row.getAs[Long]("ph") ===
      HashKernels.polyHash(UTF8String.fromString(text)))
    assert(row.getAs[Long]("sh") ===
      HashKernels.simHash(UTF8String.fromString(text)))
    assert(row.getAs[Long]("fp") ===
      HashKernels.fingerprint(UTF8String.fromString(text)))
    assert(row.getAs[Seq[Long]]("mh").toArray ===
      HashKernels.minHashSig(UTF8String.fromString(text)).toLongArray())
    assert(row.getAs[Int]("dl") === Analyzer.analyzeStop(text).length)
  }

  test("graft_rep_stats / graft_gram_hashes SQL routes match the kernels") {
    import spark.implicits._
    Seq(("a b a b c", 1L)).toDF("text", "id").createOrReplaceTempView("t_rep")
    val row = spark.sql(
      """SELECT graft_rep_stats(text) AS rs,
        |       graft_gram_hashes(text, 2, 2, true) AS ch,
        |       graft_gram_hashes(text, 3, 1, false) AS sh
        |FROM t_rep""".stripMargin).head()
    val u8 = UTF8String.fromString("a b a b c")
    assert(row.getAs[Seq[Long]]("rs").toArray ===
      HashKernels.repStats(u8).toLongArray())
    assert(row.getAs[Seq[Long]]("ch").toArray ===
      HashKernels.gramHashes(u8, 2, 2, partial = true).toLongArray())
    assert(row.getAs[Seq[Long]]("sh").toArray ===
      HashKernels.gramHashes(u8, 3, 1, partial = false).toLongArray())
    // non-literal geometry args are rejected, not silently misread
    val err = intercept[Exception] {
      spark.sql("SELECT graft_gram_hashes(text, id + 1, 1, true) FROM t_rep").head()
    }
    assert(err.getMessage.contains("literal"))
  }

  test("graft_field_tf takes a literal chain and carries positions") {
    import spark.implicits._
    // own fixture view: this test must not depend on a sibling test's view
    Seq(("x", 1L)).toDF("text", "id").createOrReplaceTempView("t")
    val row = spark.sql(
      """SELECT graft_field_tf(array('united of states', 'b'), 'text_stop') AS at"""
    ).head().getStruct(0)
    assert(row.getAs[Int]("dl") === 3) // of dropped, position gap kept
    val tfs = row.getSeq[org.apache.spark.sql.Row](row.fieldIndex("tfs"))
    val byTerm = tfs.map(r => r.getAs[String]("term") ->
      (r.getAs[Int]("tf"),
        r.getSeq[Int](r.fieldIndex("pos")).toList)).toMap
    assert(byTerm("united") === ((1, List(0))))
    assert(byTerm("states") === ((1, List(2))))
    assert(byTerm("b") === ((1, List(103)))) // multi-value gap
    // a non-literal chain argument is a loud error, not a silent default
    val e = intercept[Exception] {
      spark.sql("SELECT graft_field_tf(array('x'), text) FROM t").collect()
    }
    assert(e.getMessage.contains("string literal"))
  }

  test("graft_dot over float vectors") {
    val d = spark.sql(
      "SELECT graft_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(0.5 AS FLOAT)))").head().getDouble(0)
    assert(math.abs(d - 4.0) < 1e-9)
  }

  test("build-time extension route registers the same set") {
    // a cloned session carries the parent's registry; a FRESH builder with
    // withExtensions applies the class — exercise the class's apply by
    // injecting into a new SparkSessionExtensions and counting
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw; set is shared
    assert(GraftExtensions.functions.map(_._1.funcName).distinct.size ===
      GraftExtensions.functions.size)
  }
}
