package graft.index

import scala.collection.mutable.ArrayBuffer

/** Posting-list compression: docID-gap delta encoding + variable-byte codec,
  * with per-block max-score metadata for block-max WAND pruning.
  *
  * This is the engine-native replacement for the index layer the reference
  * delegates to Elasticsearch/Lucene (reference `elastic/settings.go:54`
  * requests `codec: best_compression`; Lucene internally stores postings as
  * delta-gap-compressed blocks — public format knowledge). Pure Scala, no
  * Spark dependency: runs inside `mapPartitions` kernels and is
  * property-tested (decode∘encode == id) without a SparkSession.
  */
object Codec extends Serializable {

  /** Postings per block. 128 mirrors Lucene's block size; each block carries
    * its own max-impact metadata so WAND can skip it wholesale. */
  val BlockSize: Int = 128

  // ---- variable-byte primitive ------------------------------------------

  /** Append v (must be >= 0) as LEB128-style varint. */
  def writeVarLong(buf: ArrayBuffer[Byte], v0: Long): Unit = {
    require(v0 >= 0, s"varlong requires non-negative value, got $v0")
    var v = v0
    while ((v & ~0x7fL) != 0L) {
      buf += ((v & 0x7f) | 0x80).toByte
      v >>>= 7
    }
    buf += v.toByte
  }

  /** Read a varint starting at pos; returns (value, nextPos). */
  def readVarLong(bytes: Array[Byte], pos: Int): (Long, Int) = {
    var v = 0L
    var shift = 0
    var p = pos
    var b = bytes(p)
    while ((b & 0x80) != 0) {
      v |= (b & 0x7fL) << shift
      shift += 7
      p += 1
      b = bytes(p)
    }
    v |= (b & 0x7fL) << shift
    (v, p + 1)
  }

  // ---- delta-gap docID encoding -----------------------------------------

  /** Encode a strictly-increasing docID array as first-value + gaps, varbyte. */
  def encodeDocIds(sorted: Array[Long]): Array[Byte] = {
    val buf = new ArrayBuffer[Byte](sorted.length * 2)
    var prev = 0L
    var i = 0
    while (i < sorted.length) {
      val d = sorted(i)
      val gap = if (i == 0) d else d - prev - 1
      require(i == 0 || d > prev, s"docIds must be strictly increasing at $i")
      writeVarLong(buf, gap)
      prev = d
      i += 1
    }
    buf.toArray
  }

  def decodeDocIds(bytes: Array[Byte], n: Int): Array[Long] = {
    val out = new Array[Long](n)
    var pos = 0
    var prev = 0L
    var i = 0
    while (i < n) {
      val (gap, next) = readVarLong(bytes, pos)
      pos = next
      prev = if (i == 0) gap else prev + gap + 1
      out(i) = prev
      i += 1
    }
    out
  }

  /** Encode term frequencies (>=1) as varbyte of tf-1. */
  def encodeTfs(tfs: Array[Int]): Array[Byte] = {
    val buf = new ArrayBuffer[Byte](tfs.length)
    var i = 0
    while (i < tfs.length) {
      require(tfs(i) >= 1, s"tf must be >= 1 at $i")
      writeVarLong(buf, (tfs(i) - 1).toLong)
      i += 1
    }
    buf.toArray
  }

  def decodeTfs(bytes: Array[Byte], n: Int): Array[Int] = {
    val out = new Array[Int](n)
    var pos = 0
    var i = 0
    while (i < n) {
      val (v, next) = readVarLong(bytes, pos)
      pos = next
      out(i) = v.toInt + 1
      i += 1
    }
    out
  }
}
