package graft.extract

import java.io.{BufferedInputStream, FileInputStream, InputStream}
import java.nio.file.{Files, Path, Paths}
import java.util.zip.GZIPInputStream
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Crossref source layer (reference data.go): directory scan with extension
  * filter, gzip by extension, JSON-vs-NDJSON format sniffing, streaming
  * parse, error handling (SURVEY §2.1 S1-S9).
  *
  * Spark mapping: file LISTING and format SNIFFING are driver-side (cheap —
  * a few bytes per file, same as the reference's per-file token peek,
  * data.go:210-242); the PARSING is distributed: line-delimited JSON splits
  * across tasks, dump files parse whole-file (multiLine) which matches the
  * reference's one-decoder-per-file constraint — and gzip is non-splittable
  * in both systems anyway (data.go:90-96 analogue).
  */
object CrossrefReader {

  sealed trait Format { def name: String }
  case object Ndjson extends Format { val name = "ndjson" }
  case object DumpJson extends Format { val name = "json" }

  private val acceptedExts = Set(".json", ".ndjson", ".gz", ".gzip")

  private def ext(p: String): String = {
    val i = p.lastIndexOf('.')
    if (i < 0) "" else p.substring(i)
  }

  /** S1: recursive walk keeping only data extensions (data.go:154-176). */
  def listFiles(dir: String): Seq[String] = {
    val root = Paths.get(dir)
    if (!Files.exists(root)) return Seq.empty
    Files.walk(root).iterator().asScala
      .filter(p => Files.isRegularFile(p) && acceptedExts.contains(ext(p.toString)))
      .map(_.toString).toSeq.sorted
  }

  /** S5: compression by extension, explicit flag wins (data.go:186-196). */
  def isGzip(path: String): Boolean = ext(path) == ".gz" || ext(path) == ".gzip"

  /** S6: format sniff — decode the first two JSON tokens; second token
    * "items" ⇒ dump JSON, else NDJSON (data.go:210-242). Reads only the
    * head bytes (gunzip streaming, never the whole file). */
  def sniffFormat(path: String): Format = {
    val raw: InputStream = new BufferedInputStream(new FileInputStream(path))
    val in = if (isGzip(path)) new GZIPInputStream(raw) else raw
    try {
      val head = new Array[Byte](4096)
      var n = 0
      var r = 0
      while (n < head.length && r >= 0) {
        r = in.read(head, n, head.length - n)
        if (r > 0) n += r
      }
      val s = new String(head, 0, n, java.nio.charset.StandardCharsets.UTF_8)
      // token 1 must be '{'; token 2 is the first object key
      val i = s.indexWhere(!_.isWhitespace)
      if (i < 0 || s.charAt(i) != '{') throw new IllegalArgumentException(
        s"cannot sniff format of $path: does not start with '{'")
      val j = s.indexOf('"', i + 1)
      if (j < 0) throw new IllegalArgumentException(
        s"cannot sniff format of $path: no JSON key in head")
      val k = s.indexOf('"', j + 1)
      val firstKey = if (k < 0) "" else s.substring(j + 1, k)
      if (firstKey == "items") DumpJson else Ndjson
    } finally in.close()
  }

  /** S7: NDJSON reader — native line-delimited JSON with the pinned schema.
    * strict=true maps to FAILFAST (reference fails the file on a bad
    * element, data.go:58-63); otherwise PERMISSIVE with _corrupt_record. */
  def readNdjson(spark: SparkSession, paths: Seq[String],
                 strict: Boolean = true): DataFrame = {
    val mode = if (strict) "FAILFAST" else "PERMISSIVE"
    spark.read.schema(Crossref.schema).option("mode", mode)
      .json(paths: _*)
  }

  /** S8: dump reader — `{"items":[...]}`: whole-file parse + explode. */
  def readDump(spark: SparkSession, paths: Seq[String],
               strict: Boolean = true): DataFrame = {
    val mode = if (strict) "FAILFAST" else "PERMISSIVE"
    spark.read.schema(Crossref.dumpSchema).option("multiLine", "true")
      .option("mode", mode)
      .json(paths: _*)
      .select(explode(col("items")).as("r"))
      .select("r.*")
  }

  /** S9b: dead-letter accounting — the engine analogue of the reference's
    * structured bulk-error decode (elastic/error.go:1-44) and failed-doc
    * counting (elastic/elastic.go:181-187). A PERMISSIVE parse keeps each
    * unparseable input as a `_corrupt_record` row; this surfaces per-file
    * counts plus one sample line, ready to land in a lineage/metrics table.
    *
    * The `.cache()` is load-bearing, not an optimization: Spark refuses
    * queries whose only referenced JSON column is the internal corrupt
    * column (SPARK-21610), and caching the parsed relation is the
    * documented escape. The relation cached is the dead-letter AUDIT scan,
    * batch-sized, not the bulk ingest path. */
  def deadLetters(spark: SparkSession, paths: Seq[String]): DataFrame = {
    val withCorrupt = org.apache.spark.sql.types.StructType(
      Crossref.schema.fields :+ org.apache.spark.sql.types.StructField(
        "_corrupt_record", org.apache.spark.sql.types.StringType))
    val parsed = spark.read.schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(paths: _*)
      .withColumn("src_file", input_file_name())
      .cache()
    try parsed
      .filter(col("_corrupt_record").isNotNull)
      .groupBy(col("src_file"))
      .agg(count(lit(1)).as("n_corrupt"),
        first(col("_corrupt_record")).as("sample"))
      .orderBy("src_file")
      .localCheckpoint() // materialize before unpersist
    finally parsed.unpersist()
  }

  /** S2/S3-ish entry: load a file or directory, sniffing format per file and
    * unioning the two reader plans. An explicit `format` skips the sniff for
    * every file (the reference's `--format` flag, `config/config.go:19`,
    * consumed `data.go:199-207`). Returns records in the Crossref schema. */
  def load(spark: SparkSession, path: String, strict: Boolean = true,
           format: Option[Format] = None): DataFrame = {
    val files =
      if (Files.isDirectory(Paths.get(path))) listFiles(path) else Seq(path)
    require(files.nonEmpty, s"no data files under $path")
    val (dumps, ndjsons) = format match {
      case Some(DumpJson) => (files, Seq.empty[String])
      case Some(Ndjson) => (Seq.empty[String], files)
      case None => files.partition(f => sniffFormat(f) == DumpJson)
    }
    val parts = Seq(
      if (ndjsons.nonEmpty) Some(readNdjson(spark, ndjsons, strict)) else None,
      if (dumps.nonEmpty) Some(readDump(spark, dumps, strict)) else None).flatten
    parts.reduce(_.unionByName(_))
  }

  /** Full pipeline: sources → SimplifiedPublication, with last-write-wins
    * dedup by DOI (the ES "index"-action overwrite semantics,
    * elastic/elastic.go:165-167). */
  def simplified(spark: SparkSession, path: String, strict: Boolean = true,
                 format: Option[Format] = None): DataFrame =
    Crossref.simplify(load(spark, path, strict, format))
      .dropDuplicates("DOI")
}
