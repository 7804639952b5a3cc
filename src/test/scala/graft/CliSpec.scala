package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.cli.{Cli, Main}
import graft.index.IndexTables
import graft.io.TableIO
import graft.query.Searcher

/** CLI/config layer: kong-equivalent parse precedence (flag > env >
  * default), enum + validator behavior mirroring config/config.go:55-73,
  * and the end-to-end index job over the crossref fixtures. */
class CliSpec extends AnyFunSuite {

  test("defaults + env fallback + flag precedence") {
    val byDefault = Cli.parse(Array("--dir", "/tmp/x"), env = Map.empty)
    assert(byDefault("format") === "unknown")
    assert(byDefault("index-dir") === "./graft-index")
    assert(byDefault.long("shard-size") === 1048576L)

    val byEnv = Cli.parse(Array("--dir", "/tmp/x"),
      env = Map("GRAFT_FORMAT" -> "ndjson", "GRAFT_SHARD_SIZE" -> "4096"))
    assert(byEnv("format") === "ndjson")
    assert(byEnv.long("shard-size") === 4096L)

    val flagWins = Cli.parse(Array("--dir", "/tmp/x", "--format", "json"),
      env = Map("GRAFT_FORMAT" -> "ndjson"))
    assert(flagWins("format") === "json")
  }

  test("unknown flags, enum violations and validators fail with usage") {
    def msg(args: Array[String], env: Map[String, String] = Map.empty) =
      intercept[Cli.CliError](Cli.parse(args, env)).getMessage
    assert(msg(Array("--nope", "1")).contains("unknown flag"))
    assert(msg(Array("--dir")).contains("missing value"))
    assert(msg(Array("--dir", "/tmp/x", "--format", "xml"))
      .contains("must be one of"))
    // config.go:55-59 — either dir or file
    assert(msg(Array("--format", "ndjson")).contains("dir or file"))
    // config.go:61-73 — stdin requires explicit format and compression
    assert(msg(Array("--file", "-")).contains("Format must be specified"))
    assert(msg(Array("--file", "-", "--format", "ndjson"))
      .contains("Compression must be specified"))
    assert(intercept[Cli.CliError](Cli.parse(Array("--nope", "1")))
      .getMessage.contains("usage: graft"))
  }

  test("end-to-end: index job over crossref fixtures, searchable by DOI map") {
    lazy val spark: SparkSession = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val fixtures = graft.extract.CrossrefFixtures.ensure(
      s"${sys.props("user.dir")}/target/fixtures")
    val idxDir = s"${sys.props("user.dir")}/target/cli-idx"
    new TableIO(idxDir).deleteAll()

    val io = Main.run(spark, Cli.parse(Array(
      "--file", s"$fixtures/ndjson_plain.ndjson",
      "--index-dir", idxDir,
      "--shard-size", "256"), env = Map.empty))
    assert(io.isComplete("doc_map"))
    assert(io.isComplete(graft.index.FieldedIndex.FinalStep))

    // doc_map carries the DOI identity; every mapped field present in
    // SimplifiedPublication got its own sub-index with its spec'd analyzer
    val docMap = spark.read.parquet(s"$idxDir/doc_map")
    assert(docMap.columns.contains("doi"))
    assert(docMap.count() === 1000)
    for (f <- Seq("DOI", "title", "journal", "abbreviated_journal", "volume",
        "issue", "year", "first_page", "bibliographic"))
      assert(graft.index.PostingsBuilder.isComplete(
        graft.index.FieldedIndex.fieldDir(idxDir, f)), s"field $f not built")
    // the bibliographic field is the reference query path's target
    // (settings.go:133-136) — BM25 serves from its sub-index
    val hits = Searcher.search(spark,
      graft.index.FieldedIndex.fieldDir(idxDir, "bibliographic"),
      Seq(1 -> "journal title"), 5)
    assert(hits.count() > 0)
    // keyword DOI lookup (ES term query) resolves through doc_map
    val h = Searcher.open(spark,
      graft.index.FieldedIndex.fieldDir(idxDir, "DOI"))
    try {
      val docs = Searcher.termDocs(h, Seq("10.1/nd.77"))
        .join(docMap, "doc_id").select("doi").collect().map(_.getString(0))
      assert(docs.toSeq === Seq("10.1/nd.77"))
    } finally h.close()

    // re-running against the EXISTING index is the reference's bulk
    // overwrite, not a no-op and not duplication: the file lands as a new
    // epoch and compaction folds it LWW by DOI immediately
    Main.run(spark, Cli.parse(Array(
      "--file", s"$fixtures/ndjson_plain.ndjson",
      "--index-dir", idxDir,
      "--shard-size", "256"), env = Map.empty))
    assert(spark.read.parquet(s"$idxDir/doc_map").count() === 1000)
    assert(Searcher.search(spark,
      graft.index.FieldedIndex.fieldDir(idxDir, "bibliographic"),
      Seq(1 -> "journal title"), 5).count() > 0)

    // query-side CLI: field-targeted BM25 through the same index (the
    // _search endpoint stand-in); DOI keyword field via --field
    val qa = graft.cli.Query.parse(Array(
      "--index-dir", idxDir, "--field", "title", "--k", "3",
      "title", "42"))
    val qHits = graft.cli.Query.run(spark, qa)
    assert(qHits.nonEmpty && qHits.head._1 === 1L)
    assert(qHits.head._2 === "10.1/nd.42") // the discriminative-term doc
    assert(intercept[graft.cli.Cli.CliError](
      graft.cli.Query.parse(Array("--index-dir", idxDir)))
      .getMessage.contains("usage"))
    assert(intercept[graft.cli.Cli.CliError](
      graft.cli.Query.run(spark, qa.copy(field = "nope")))
      .getMessage.contains("unknown field"))

    // --type dispatch: every ES query kind through one CLI
    def lines(t: String, f: String, q: String): Seq[String] =
      graft.cli.Query.runAny(spark,
        qa.copy(qtype = t, field = f, query = q))
    assert(lines("match", "title", "title 42").head.startsWith("1 10.1/nd.42 "))
    assert(lines("phrase", "title", "title 42").head.startsWith("1 10.1/nd.42 "))
    assert(lines("suggest", "title", "recrod").head ===
      lines("suggest", "title", "recrod").head) // deterministic
    assert(lines("suggest", "title", "recrod").head.contains("record"))
    assert(lines("count", "title", "record") === Seq("hits 1000"))
    assert(lines("range", "year", "1993 1995").size === 102)
    assert(lines("prefix", "DOI", "10.1/nd.99").size === 11)
    assert(lines("qstring", "title", "+record 42 -999")
      .head.startsWith("1 10.1/nd.42 "))
    // the request-body endpoint: a JSON body through the strict DSL
    val body = """{"query":{"match":{"title":"title 42"}},"size":3}"""
    val dsl = graft.cli.Search.run(spark,
      graft.cli.Search.parse(Array("--index-dir", idxDir, body)))
    assert(dsl.head.startsWith("1 10.1/nd.42 "))
    // '-' reads the body from stdin
    assert(graft.cli.Search.parse(Array("--index-dir", idxDir, "-"),
      stdin = body).body === body)
    assert(intercept[graft.cli.Cli.CliError] {
      graft.cli.Search.run(spark, graft.cli.Search.parse(
        Array("--index-dir", idxDir, """{"query":{"nope":{}}}""")))
    }.getMessage.contains("unsupported query type"))
    assert(intercept[graft.cli.Cli.CliError](
      graft.cli.Search.parse(Array("--index-dir", idxDir)))
      .getMessage.contains("usage"))

    // span_near: --slop widens the ordered proximity window
    assert(graft.cli.Query.runAny(spark, qa.copy(qtype = "span_near",
      field = "title", query = "record 42", slop = 0))
      .head.startsWith("1 10.1/nd.42 "))
    assert(graft.cli.Query.parse(Array("--index-dir", idxDir,
      "--type", "span_near", "--slop", "2", "record", "42")).slop === 2)
    // unordered: reversed clause order still finds the doc
    assert(graft.cli.Query.runAny(spark, qa.copy(
      qtype = "span_near_unordered", field = "title", query = "42 record"))
      .head.startsWith("1 10.1/nd.42 "))
    assert(intercept[graft.cli.Cli.CliError](graft.cli.Query.parse(
      Array("--slop", "x", "q"))).getMessage.contains("integer"))
    // scroll: deep export walks the 1997 cohort (34 docs) in pages of 3
    val scrolled = lines("scroll", "year", "1997")
    assert(scrolled.size === 34)
    assert(scrolled.head.startsWith("1 1 ") && scrolled.last.startsWith("12 1 "))
    assert(intercept[graft.cli.Cli.CliError](graft.cli.Query.parse(
      Array("--type", "nope", "x"))).getMessage.contains("unknown --type"))
    assert(intercept[graft.cli.Cli.CliError](
      lines("range", "year", "1993")).getMessage.contains("two bounds"))

    // --remove-index rebuilds from scratch (elastic.go:71-87 analogue)
    val io2 = Main.run(spark, Cli.parse(Array(
      "--file", s"$fixtures/ndjson_plain.ndjson",
      "--index-dir", idxDir, "--remove-index", "true",
      "--shard-size", "256"), env = Map.empty))
    assert(io2.isComplete("doc_map"))

    // S3 stdin source (data.go:118-126): pipe the gzipped ndjson twin in
    // with explicit format+compression; same index as the file path
    val stdinIdx = s"${sys.props("user.dir")}/target/cli-idx-stdin"
    new TableIO(stdinIdx).deleteAll()
    val piped = java.nio.file.Files.newInputStream(
      java.nio.file.Paths.get(s"$fixtures/ndjson_gz.json.gz"))
    val io3 = try Main.run(spark, Cli.parse(Array(
      "--file", "-", "--format", "ndjson", "--compression", "gzip",
      "--index-dir", stdinIdx, "--shard-size", "256"), env = Map.empty),
      stdin = piped)
    finally piped.close()
    assert(io3.isComplete("doc_map"))
    assert(spark.read.parquet(s"$stdinIdx/doc_map").count() ===
      spark.read.parquet(s"$idxDir/doc_map").count())

    // mid-swap crash window: a compaction that died between the two swap
    // renames leaves live absent + `.old` present. The CLI must recover
    // FIRST and then take the append path — before round 4 it saw
    // isComplete=false, took the batch-build branch, whose build-side
    // recovery returned the recovered index early, and the input file was
    // silently never ingested (exit 0, bulk dropped).
    Files.move(Paths.get(idxDir), Paths.get(s"$idxDir.old"))
    val before = new TableIO(s"$idxDir.old").committedSteps()
      .count(_.startsWith("compact_e"))
    val io4 = Main.run(spark, Cli.parse(Array(
      "--file", s"$fixtures/ndjson_plain.ndjson",
      "--index-dir", idxDir,
      "--shard-size", "256"), env = Map.empty))
    // recovered AND ingested: the run appended a new epoch and compacted it
    assert(io4.isComplete(graft.index.FieldedIndex.FinalStep))
    assert(io4.committedSteps().count(_.startsWith("compact_e")) > before)
    assert(spark.read.parquet(s"$idxDir/doc_map").count() === 1000)
  }
}
