package graft.extract

import java.io.{BufferedWriter, FileOutputStream, OutputStreamWriter}
import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream

/** Deterministic synthetic Crossref fixtures (FIXTURES.md §1): the shape of
  * the reference's testdata (NDJSON "gap" files, dump-format "2021" files,
  * gzip twins, an ignored non-data file, an invalid-JSON error case) —
  * generated in-code, no external data, byte-stable across runs. */
object CrossrefFixtures {

  val NdjsonCount = 1000
  val DumpCount = 3000

  def record(doi: String, i: Int): String = {
    val title = s"""["Record $i title","second title $i"]"""
    s"""{"DOI":"$doi","title":$title,"author":[{"given":"g$i","family":"fam$i","sequence":"first"}],""" +
      s""""container-title":["Journal $i"],"volume":"${i % 50}","issue":"${i % 12}",""" +
      s""""issued":{"date-parts":[[${1990 + i % 30},${1 + i % 12},${1 + i % 28}]]},""" +
      s""""created":{"date-parts":[[${1990 + i % 30}]],"date-time":"2006-02-27T21:28:23Z","timestamp":1141075703000},""" +
      s""""page":"${100 + i}-${200 + i}"}"""
  }

  def write(path: String, content: String, gz: Boolean): Unit = {
    Files.createDirectories(Paths.get(path).getParent)
    val out = new FileOutputStream(path)
    val stream = if (gz) new GZIPOutputStream(out) else out
    val w = new BufferedWriter(new OutputStreamWriter(stream, "UTF-8"))
    w.write(content); w.close()
  }

  /** Generate the full fixture tree under `dir` (idempotent). */
  def ensure(dir: String): String = {
    if (!Files.exists(Paths.get(s"$dir/ndjson_plain.ndjson"))) {
      val ndjson = (0 until NdjsonCount).map(i => record(s"10.1/nd.$i", i)).mkString("\n")
      write(s"$dir/ndjson_plain.ndjson", ndjson, gz = false)
      write(s"$dir/ndjson_gz.json.gz", ndjson, gz = true)
      val items = (0 until DumpCount).map(i => record(s"10.1/dump.$i", i)).mkString(",")
      val dump = s"""{"items":[$items],"status":"ok"}"""
      write(s"$dir/dump_plain.json", dump, gz = false)
      write(s"$dir/dump_gz.json.gz", dump, gz = true)
      write(s"$dir/skipme.txt", "not data", gz = false)
      write(s"$dir/bad/invalid.json", """{"someField" = "someValue"}""" + "\n", gz = false)
    }
    dir
  }
}
