package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.extract.{Crossref, CrossrefReader}

/** Crossref layer parity tests: golden transform cases ported verbatim from
  * the reference publication_test.go (byte-identity quirks included), plus
  * count-based E2E parse tests mirroring data_test.go over deterministic
  * synthetic fixtures (FIXTURES.md §1-2). */
class CrossrefSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // ---- fixtures (deterministic; generated in-code, no external data) -----

  private val fixDir = s"${sys.props("user.dir")}/target/fixtures"

  private lazy val fixtures: String =
    graft.extract.CrossrefFixtures.ensure(fixDir)

  private def record(doi: String, i: Int): String =
    graft.extract.CrossrefFixtures.record(doi, i)

  private def write(path: String, content: String, gz: Boolean): Unit =
    graft.extract.CrossrefFixtures.write(path, content, gz)

  private def simplifyJson(jsons: Seq[String]): Seq[Row] = {
    import spark.implicits._
    Crossref.simplify(
      spark.read.schema(Crossref.schema).json(jsons.toDS())).collect().toSeq
  }

  // ---- golden transform (publication_test.go:41-118) ---------------------

  private val happyInput =
    """{"title":["title 1","title 2"],
      |"author":[{"given":"given1","family":"f1","sequence":"first"},
      |          {"given":"given2","family":"f2","sequence":"second"},
      |          {"given":"given3","family":"f3","sequence":"third"}],
      |"DOI":"DOI",
      |"container-title":["Container Title 1","Container Title 2"],
      |"short-container-title":["Short Container Title 1","Short Container Title 2"],
      |"volume":"Volume","issue":"Issue",
      |"issued":{"date-parts":[[2006,2,27]]},
      |"published-online":{},"published-print":{},
      |"created":{"date-parts":[[2006,2,27]],"date-time":"2006-02-27T21:28:23Z","timestamp":1141075703000},
      |"page":"200-300"}""".stripMargin.replaceAll("\n", "")

  test("golden: happy path (publication_test.go happy path)") {
    val r = simplifyJson(Seq(happyInput)).head
    assert(r.getAs[Seq[String]]("title") === Seq("title 1", "title 2"))
    assert(r.getAs[String]("DOI") === "DOI")
    assert(r.getAs[String]("first_page") === "200")
    assert(r.getAs[Seq[String]]("journal") === Seq("Container Title 1", "Container Title 2"))
    assert(r.getAs[Seq[String]]("abbreviated_journal") ===
      Seq("Short Container Title 1", "Short Container Title 2"))
    assert(r.getAs[String]("volume") === "Volume")
    assert(r.getAs[String]("issue") === "Issue")
    assert(r.getAs[Int]("year") === 2006)
    assert(r.getAs[String]("bibliographic") ===
      "f1 f2 f3 title 1 Container Title 1 Container Title 2 Short Container Title 1 Short Container Title 2 Volume Issue 200 2006")
  }

  test("golden: no date → year 0, bibliographic tail ' 200 0'") {
    // issued absent; published-online/print present-but-empty (the Go test's
    // non-nil pointers to zero structs) → year stops at published-online = 0
    val in = happyInput.replace(""""issued":{"date-parts":[[2006,2,27]]},""", "")
    val r = simplifyJson(Seq(in)).head
    assert(r.getAs[Int]("year") === 0)
    assert(r.getAs[String]("bibliographic") ===
      "f1 f2 f3 title 1 Container Title 1 Container Title 2 Short Container Title 1 Short Container Title 2 Volume Issue 200 0")
  }

  test("quirk: title cleanup — newline and LITERAL '( )+' replaced, trimmed") {
    val in = """{"DOI":"q1","title":["A\nB( )+C  ","(x) (y)+z"]}"""
    val r = simplifyJson(Seq(in)).head
    assert(r.getAs[Seq[String]]("title") === Seq("A B C", "(x) (y)+z"))
  }

  test("quirk: empty/absent title → [\"\"]") {
    val r1 = simplifyJson(Seq("""{"DOI":"q2","title":[]}""")).head
    assert(r1.getAs[Seq[String]]("title") === Seq(""))
    val r2 = simplifyJson(Seq("""{"DOI":"q3"}""")).head
    assert(r2.getAs[Seq[String]]("title") === Seq(""))
  }

  test("quirk: missing fields keep empty segments (doubled/leading spaces)") {
    val r = simplifyJson(Seq("""{"DOI":"q4"}""")).head
    // families, title(0)="", container, short, volume, issue, page, year=0
    assert(r.getAs[String]("bibliographic") === "       0")
  }

  test("quirk: firstPage split on , - whitespace; leading delimiter → empty") {
    val rows = simplifyJson(Seq(
      """{"DOI":"a","page":"200-300"}""",
      """{"DOI":"b","page":"12,15"}""",
      """{"DOI":"c","page":"7 9"}""",
      """{"DOI":"d","page":",5"}""",
      """{"DOI":"e","page":""}""",
      """{"DOI":"f"}"""))
    assert(rows.map(_.getAs[String]("first_page")) ===
      Seq("200", "12", "7", "", "", ""))
  }

  test("quirk: year presence-coalesce — empty issued does NOT fall through") {
    // issued present but empty → 0 (no fallback to published-print 1999)
    val r1 = simplifyJson(Seq(
      """{"DOI":"y1","issued":{"date-parts":[]},"published-print":{"date-parts":[[1999]]}}""")).head
    assert(r1.getAs[Int]("year") === 0)
    // issued absent → published-online wins over print
    val r2 = simplifyJson(Seq(
      """{"DOI":"y2","published-online":{"date-parts":[[2010,1]]},"published-print":{"date-parts":[[1999]]}}""")).head
    assert(r2.getAs[Int]("year") === 2010)
    // only created → conservative fallback
    val r3 = simplifyJson(Seq(
      """{"DOI":"y3","created":{"date-parts":[[2021,5,5]],"date-time":"2021-05-05T00:00:00Z","timestamp":0}}""")).head
    assert(r3.getAs[Int]("year") === 2021)
  }

  test("quirk: authors with empty/missing family skipped in bibliographic") {
    val r = simplifyJson(Seq(
      """{"DOI":"a1","author":[{"family":""},{"given":"g"},{"family":"Smith"}],"title":["T"]}""")).head
    // 8 segments, 7 separators: families title0 then 5 empty segments then 0
    assert(r.getAs[String]("bibliographic") === "Smith T      0")
  }

  // ---- E2E parse counts (data_test.go:173-288) ----------------------------

  test("ndjson plain + gzip parse with expected counts and non-empty DOIs") {
    val plain = CrossrefReader.load(spark, s"$fixtures/ndjson_plain.ndjson")
    assert(plain.count() === 1000)
    val gz = CrossrefReader.load(spark, s"$fixtures/ndjson_gz.json.gz")
    assert(gz.count() === 1000)
    import org.apache.spark.sql.functions._
    assert(gz.filter(col("DOI").isNull || col("DOI") === "").count() === 0)
  }

  test("dump format plain + gzip parse (items array), sniffed per file") {
    assert(CrossrefReader.sniffFormat(s"$fixtures/dump_plain.json") ===
      CrossrefReader.DumpJson)
    assert(CrossrefReader.sniffFormat(s"$fixtures/ndjson_plain.ndjson") ===
      CrossrefReader.Ndjson)
    assert(CrossrefReader.load(spark, s"$fixtures/dump_plain.json").count() === 3000)
    assert(CrossrefReader.load(spark, s"$fixtures/dump_gz.json.gz").count() === 3000)
  }

  test("directory scan unions all formats, skips non-data files") {
    // walk keeps .json/.ndjson/.gz, recurses into bad/, ignores skipme.txt
    assert(CrossrefReader.listFiles(fixtures).size === 5)
    assert(CrossrefReader.listFiles(fixtures).count(!_.contains("bad")) === 4)
    // loading a clean dir unions ndjson + dump + gzip: 1000+1000+3000+3000
    val clean = s"${sys.props("user.dir")}/target/fixtures-clean"
    if (!Files.exists(Paths.get(s"$clean/ndjson_plain.ndjson"))) {
      for (f <- Seq("ndjson_plain.ndjson", "ndjson_gz.json.gz",
          "dump_plain.json", "dump_gz.json.gz", "skipme.txt")) {
        Files.createDirectories(Paths.get(clean))
        Files.copy(Paths.get(s"$fixtures/$f"), Paths.get(s"$clean/$f"))
      }
    }
    assert(CrossrefReader.load(spark, clean).count() === 8000)
  }

  test("invalid JSON fails the file in strict mode (data_test.go:238-247)") {
    val ex = intercept[Exception] {
      CrossrefReader.load(spark, s"$fixtures/bad/invalid.json").count()
    }
    assert(ex.getMessage != null)
  }

  test("dead-letter accounting counts corrupt records per file (elastic.go:181-187)") {
    val dir = s"${sys.props("user.dir")}/target/fixtures-deadletter"
    if (!Files.exists(Paths.get(s"$dir/mixed.ndjson"))) {
      write(s"$dir/mixed.ndjson",
        (0 until 4).map(i => record(s"10.1/ok.$i", i)) // 4 valid
          .patch(2, Seq("""{"DOI" = "broken"}""", """not json at all"""), 0)
          .mkString("\n") + "\n",
        gz = false)
      write(s"$dir/clean.ndjson",
        (0 until 3).map(i => record(s"10.1/c.$i", i)).mkString("\n") + "\n",
        gz = false)
    }
    import org.apache.spark.sql.functions.col
    val dl = CrossrefReader.deadLetters(spark,
      Seq(s"$dir/mixed.ndjson", s"$dir/clean.ndjson")).collect()
    assert(dl.length === 1) // the clean file contributes no dead letters
    assert(dl(0).getAs[String]("src_file").endsWith("mixed.ndjson"))
    assert(dl(0).getAs[Long]("n_corrupt") === 2)
    assert(dl(0).getAs[String]("sample").nonEmpty)
    // the permissive bulk path still loads the parseable records
    assert(CrossrefReader.readNdjson(spark,
      Seq(s"$dir/mixed.ndjson"), strict = false)
      .filter(col("DOI").isNotNull).count() === 4)
  }

  test("F6: encodeJson round-trips the simplified projection (elastic.go:142)") {
    val r = simplifyJson(Seq(happyInput))
    val df = Crossref.simplify(
      spark.read.schema(Crossref.schema).json {
        import spark.implicits._
        Seq(happyInput).toDS()
      })
    val row = Crossref.encodeJson(df).collect()(0)
    assert(row.getAs[String]("DOI") === "DOI")
    val json = row.getAs[String]("json")
    assert(json.contains("\"DOI\":\"DOI\""))
    assert(json.contains("\"year\":2006"))
    // parse back in Spark: field-for-field identity with the projection
    import spark.implicits._
    val back = spark.read.schema(df.schema)
      .json(Seq(json).toDS()).collect()(0)
    assert(back === r.head)
  }

  test("simplified pipeline dedups by DOI last-write-wins") {
    val dir = s"${sys.props("user.dir")}/target/fixtures-dedup"
    if (!Files.exists(Paths.get(s"$dir/a.ndjson"))) {
      write(s"$dir/a.ndjson",
        (0 until 10).map(i => record(s"10.1/dup.${i % 5}", i)).mkString("\n"),
        gz = false)
    }
    assert(CrossrefReader.simplified(spark, s"$dir/a.ndjson").count() === 5)
  }
}
