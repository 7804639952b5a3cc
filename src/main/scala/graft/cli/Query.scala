package graft.cli

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.index.FieldedIndex
import graft.query.Searcher

/** Query-side CLI — the engine's stand-in for the reference deployment's
  * Elasticsearch `_search` endpoint (clients like Biblio-Glutton POST
  * field-targeted match queries; `SURVEY.md §3.3`):
  *
  *   runMain graft.cli.Query --index-dir DIR [--field bibliographic]
  *     [--k 10] [--master local[*]] QUERY TEXT...
  *
  * Analyzes the query with the target field's mapped chain, serves BM25
  * top-k from the field's sub-index, resolves keys through doc_map, and
  * prints one `rank key score_x6` line per hit. */
object Query {

  final case class Args(indexDir: String, field: String, k: Int,
      master: String, query: String)

  def parse(argv: Array[String]): Args = {
    var indexDir = "./graft-index"
    var field = "bibliographic"
    var k = 10
    var master = "local[*]"
    val rest = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    def value(flag: String): String = {
      i += 1
      if (i >= argv.length) throw Cli.CliError(s"missing value for $flag")
      argv(i)
    }
    while (i < argv.length) {
      argv(i) match {
        case "--index-dir" => indexDir = value("--index-dir")
        case "--field" => field = value("--field")
        case "--k" => k = value("--k").toInt
        case "--master" => master = value("--master")
        case f if f.startsWith("--") => throw Cli.CliError(s"unknown flag $f")
        case w => rest += w
      }
      i += 1
    }
    if (rest.isEmpty) throw Cli.CliError(
      "usage: graft.cli.Query [--index-dir DIR] [--field F] [--k N] QUERY...")
    Args(indexDir, field, k, master, rest.mkString(" "))
  }

  /** Run one query; returns (rank, key, score_x6) rows. Separated from
    * [[main]] for spec-level testing. */
  def run(spark: SparkSession, a: Args): Seq[(Long, String, Long)] = {
    val spec = FieldedIndex.CrossrefMapping.find(_.field == a.field)
      .getOrElse(throw Cli.CliError(s"unknown field ${a.field} (mapped: " +
        FieldedIndex.CrossrefMapping.map(_.field).mkString(", ") + ")"))
    val hits = FieldedIndex.searchField(spark, a.indexDir, spec,
      Seq(1 -> a.query), a.k)
    val keyed = hits.join(FieldedIndex.docMap(spark, a.indexDir), "doc_id")
    val keyName = keyed.columns.last
    keyed.orderBy("rnk")
      .select(col("rnk"), col(keyName), col("score_x6"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSeq
  }

  def main(argv: Array[String]): Unit = {
    val a =
      try parse(argv)
      catch {
        case e: Cli.CliError => System.err.println(e.getMessage); sys.exit(2)
      }
    val spark = SparkSession.builder()
      .master(a.master)
      .appName("graft-query")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, a).foreach { case (rnk, key, s) => println(s"$rnk $key $s") }
    finally spark.stop()
  }
}
