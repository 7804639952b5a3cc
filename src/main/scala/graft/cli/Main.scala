package graft.cli

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.extract.CrossrefReader
import graft.index.PostingsBuilder
import graft.io.TableIO
import graft.web.WebIndex

/** The reference CLI's one job, engine-native (`cmd/crossrefindexer/
  * main.go:60-140`): load crossref files → simplify → LWW-dedup by DOI →
  * index. The sink is the engine's own table build instead of an ES bulk
  * request: the searchable text is the `bibliographic` field (the field the
  * reference's query path searches, `elastic/settings.go:133-136`), the DOI
  * is the external doc identity (ES `_id`), and `--remove-index` maps to
  * deleting the index directory before the build (`elastic.go:71-87`). */
object Main {

  /** Run the index job; separated from [[main]] for spec-level testing. */
  def run(spark: SparkSession, cfg: Cli.Config): TableIO = {
    if (cfg.bool("remove-index")) new TableIO(cfg("index-dir")).deleteAll()
    // '-' (the reference's stdin marker) expects the caller to have piped
    // into a temp file; validation already forced explicit format for it
    val path = cfg.get("file").filterNot(_ == "-")
      .orElse(cfg.get("dir"))
      .getOrElse(throw Cli.CliError("stdin input requires piping to a file"))
    val fmt = cfg("format") match {
      case "json" => Some(CrossrefReader.DumpJson)
      case "ndjson" => Some(CrossrefReader.Ndjson)
      case _ => None
    }
    val pubs = CrossrefReader.simplified(
      spark, path, strict = cfg.bool("strict"), format = fmt)
    WebIndex.buildFromCorpus(spark,
      pubs.select(col("DOI").as("doi"), col("bibliographic").as("text")),
      cfg("index-dir"),
      PostingsBuilder.Config(
        shardSize = cfg.long("shard-size"),
        shardGroups = cfg.int("shard-groups")),
      keyCol = "doi")
  }

  def main(args: Array[String]): Unit = {
    val cfg =
      try Cli.parse(args)
      catch {
        case e: Cli.CliError =>
          System.err.println(e.getMessage)
          sys.exit(2)
      }
    val spark = SparkSession.builder()
      .master(cfg("master"))
      .appName("graft-crossref-index")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel(cfg("loglevel").toUpperCase)
    try run(spark, cfg)
    finally spark.stop()
  }
}
