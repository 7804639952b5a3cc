package graft.extract

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Crossref record schema + the SimplifiedPublication transform (reference
  * publication.go), re-expressed as native Catalyst column expressions.
  *
  * The schema is EXPLICIT and lenient (nullable everywhere): Go's
  * encoding/json drops unknown keys and zero-fills missing ones
  * (publication.go:10 comment), so the struct is a projection schema over
  * evolving dump vintages. Spark equivalent: a pinned StructType passed to
  * spark.read.schema(...) — never inference, which would need an extra pass
  * and drift across vintages (SURVEY §1.3).
  */
object Crossref {

  private val dateParts: DataType = ArrayType(ArrayType(IntegerType))
  private val datePartsStruct = StructType(Seq(
    StructField("date-parts", dateParts)))
  private val indexedStruct = StructType(Seq(
    StructField("date-parts", dateParts),
    StructField("date-time", TimestampType),
    StructField("timestamp", LongType)))
  private val authorStruct = StructType(Seq(
    StructField("given", StringType),
    StructField("family", StringType),
    StructField("sequence", StringType),
    StructField("affiliation", ArrayType(StructType(Seq(
      StructField("name", StringType)))))))
  private val referenceStruct = StructType(Seq(
    StructField("key", StringType),
    StructField("volume-title", StringType),
    StructField("author", StringType),
    StructField("year", StringType),
    StructField("first-page", StringType),
    StructField("article-title", StringType),
    StructField("doi-asserted-by", StringType),
    StructField("DOI", StringType),
    StructField("volume", StringType),
    StructField("journal-title", StringType),
    StructField("issue", StringType),
    StructField("unstructured", StringType)))
  private val licenseStruct = StructType(Seq(
    StructField("URL", StringType),
    StructField("start", indexedStruct),
    StructField("delay-in-days", IntegerType),
    StructField("content-version", StringType)))
  private val linkStruct = StructType(Seq(
    StructField("URL", StringType),
    StructField("content-type", StringType),
    StructField("content-version", StringType),
    StructField("intended-application", StringType)))

  /** Mirror of the 40-field Crossref struct (publication.go:11-55). */
  val schema: StructType = StructType(Seq(
    StructField("abstract", StringType),
    StructField("author", ArrayType(authorStruct)),
    StructField("container-title", ArrayType(StringType)),
    StructField("content-domain", StructType(Seq(
      StructField("domain", ArrayType(StringType)),
      StructField("crossmark-restriction", BooleanType)))),
    StructField("created", indexedStruct),
    StructField("deposited", indexedStruct),
    StructField("DOI", StringType),
    StructField("indexed", indexedStruct),
    StructField("is-referenced-by-count", IntegerType),
    StructField("ISSN", ArrayType(StringType)),
    StructField("issn-type", ArrayType(StructType(Seq(
      StructField("value", StringType), StructField("type", StringType))))),
    StructField("issue", StringType),
    StructField("issued", datePartsStruct),
    StructField("journal-issue", StructType(Seq(
      StructField("issue", StringType),
      StructField("published-online", datePartsStruct),
      StructField("published-print", datePartsStruct)))),
    StructField("language", StringType),
    StructField("link", ArrayType(linkStruct)),
    StructField("member", StringType),
    StructField("original-title", ArrayType(StringType)),
    StructField("page", StringType),
    StructField("prefix", StringType),
    StructField("published", datePartsStruct),
    StructField("published-online", datePartsStruct),
    StructField("published-other", datePartsStruct),
    StructField("published-print", datePartsStruct),
    StructField("publisher", StringType),
    StructField("reference", ArrayType(referenceStruct)),
    StructField("reference-count", IntegerType),
    StructField("references-count", IntegerType),
    StructField("relation", StructType(Seq(
      StructField("cites", ArrayType(StringType))))),
    StructField("resource", StructType(Seq(
      StructField("primary", StructType(Seq(StructField("URL", StringType))))))),
    StructField("score", DoubleType),
    StructField("short-container-title", ArrayType(StringType)),
    StructField("short-title", ArrayType(StringType)),
    StructField("source", StringType),
    StructField("subject", ArrayType(StringType)),
    StructField("subtitle", ArrayType(StringType)),
    StructField("title", ArrayType(StringType)),
    StructField("type", StringType),
    StructField("URL", StringType),
    StructField("update-policy", StringType),
    StructField("volume", StringType),
    StructField("license", ArrayType(licenseStruct)),
    StructField("alternative-id", ArrayType(StringType))))

  /** Wrapper schema for the dump format `{"items": [...]}` (S8). */
  val dumpSchema: StructType = StructType(Seq(
    StructField("items", ArrayType(schema))))

  // ---- F1: pubTitle (publication.go:123-134) ----------------------------
  // Per element: replace "\n"→" ", replace the LITERAL string "( )+"→" "
  // (Go strings.Replace is not regex — the latent bug is replicated
  // verbatim), TrimSpace; empty/absent array → [""].
  def pubTitle(title: Column): Column =
    when(title.isNull || size(title) === 0, array(lit("")))
      .otherwise(transform(title, t =>
        trim(replace(replace(t, lit("\n"), lit(" ")), lit("( )+"), lit(" ")))))

  // ---- F2: firstPage (publication.go:136-143) ---------------------------
  // regex-split page on `,|-|\s`, take piece 0 ("200-300"→"200"; ""→"").
  def firstPage(page: Column): Column =
    element_at(split(coalesce(page, lit("")), "[,\\-\\s]", -1), 1)

  // ---- F3/F4: pubYear (publication.go:145-172) --------------------------
  // Coalesce on FIELD PRESENCE (not value): issued.date-parts non-null →
  // published-online key present → published-print key present →
  // created.date-parts non-null → 0. Each branch applies extractYear's
  // bounds check (dp[0][0], else 0) — e.g. issued present-but-empty yields
  // 0 WITHOUT falling through, exactly like the Go switch.
  private def extractYear(dp: Column): Column =
    when(size(dp) >= 1 && size(element_at(dp, 1)) >= 1,
      element_at(element_at(dp, 1), 1)).otherwise(lit(0))

  def pubYear(df: DataFrame): Column = {
    val issuedDp = col("issued.date-parts")
    val createdDp = col("created.date-parts")
    when(issuedDp.isNotNull, extractYear(issuedDp))
      .when(col("published-online").isNotNull,
        extractYear(col("published-online.date-parts")))
      .when(col("published-print").isNotNull,
        extractYear(col("published-print.date-parts")))
      .when(createdDp.isNotNull, extractYear(createdDp))
      .otherwise(lit(0))
  }

  // ---- F5: buildBibliographicField (publication.go:174-200) -------------
  // Join by single spaces with EMPTY SEGMENTS KEPT (missing fields produce
  // doubled spaces — byte-identity quirk). Author families: non-empty only,
  // then trimmed (the Go make+append leading-empties artifact is erased by
  // its own TrimSpace, so filtering first is byte-identical).
  private def familiesJoined: Column =
    trim(array_join(coalesce(
      filter(transform(col("author"), a => a.getField("family")),
        f => f.isNotNull && f =!= ""),
      array().cast(ArrayType(StringType))), " "))

  def bibliographic(df: DataFrame): Column = {
    val segs: Seq[Column] = Seq(
      familiesJoined,
      element_at(pubTitle(col("title")), 1),
      array_join(coalesce(col("container-title"),
        array().cast(ArrayType(StringType))), " "),
      array_join(coalesce(col("short-container-title"),
        array().cast(ArrayType(StringType))), " "),
      coalesce(col("volume"), lit("")),
      coalesce(col("issue"), lit("")),
      firstPage(col("page")),
      pubYear(df).cast(StringType))
    // concat_ws keeps empty strings and every segment is non-null by
    // construction, so this is byte-identical to Go strings.Join(..., " ")
    concat_ws(" ", segs: _*)
  }

  /** P1: the full 40-field → 9-field projection (publication.go:221-238).
    * Column names follow the JSON tags of SimplifiedPublication
    * (publication.go:202-212). */
  def simplify(df: DataFrame): DataFrame = df.select(
    pubTitle(col("title")).as("title"),
    coalesce(col("DOI"), lit("")).as("DOI"),
    firstPage(col("page")).as("first_page"),
    col("container-title").as("journal"),
    coalesce(col("short-container-title"),
      array().cast(ArrayType(StringType))).as("abbreviated_journal"),
    coalesce(col("volume"), lit("")).as("volume"),
    coalesce(col("issue"), lit("")).as("issue"),
    pubYear(df).as("year"),
    bibliographic(df).as("bibliographic"))

  /** F6: JSON encode of a simplified doc — the reference marshals each
    * publication into the bulk request body (`elastic/elastic.go:142`
    * json.Marshal). The engine keeps docs columnar end-to-end, so this is a
    * debug/export surface only: one `to_json(struct(*))` per row, field
    * order = the SimplifiedPublication JSON-tag order of [[simplify]]. */
  def encodeJson(simplified: DataFrame): DataFrame =
    simplified.select(
      col("DOI"),
      to_json(struct(simplified.columns.map(col): _*)).as("json"))
}
