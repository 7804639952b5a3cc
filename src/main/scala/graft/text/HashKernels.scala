package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.dedup.Dedup

/** Data-derived ids and row-local signature kernels for the dedup /
  * fingerprint operators.
  *
  * The id function is a polynomial codepoint hash `h ← (131·h + cp) mod p`
  * (p = 2^31−1) — chosen over xxhash64 because it is expressible verbatim in
  * the DuckDB oracle (a char fold), so BOTH engines derive the identical id
  * from the shingle/term bytes with NO dictionary: no driver-side vocabulary
  * collect, no single-partition dense_rank window, no dictionary join — the
  * id is a pure per-row function, which is the 10^12-doc shape (the round-1
  * dense-rank/global-sort formulations were the scale blockers flagged in
  * VERDICT r1).
  *
  * Built on the hash, the three signature kernels are fully row-local (one
  * text in → signature out, inside whole-stage codegen), so the dedup
  * pipelines shuffle only candidate pairs, never token or dictionary
  * relations. The fold is over CODEPOINTS (decoded inline from the UTF-8
  * bytes, still allocation-free): the oracle's `ascii(substr(c, i, 1))`
  * yields the i-th character's codepoint, so the two folds agree on ALL
  * valid-UTF-8 text, not just the ASCII corpus (non-ASCII agreement is
  * asserted in KernelSpec against a String.codePoints reference).
  */
object HashKernels {

  /** (131·h + codepoint) mod p over the string's codepoints; "" → 0. */
  def polyHash(s: UTF8String): Long =
    polyHashRange(s.getBytes, 0, s.numBytes())

  /** The same fold over a byte RANGE — the allocation-free primitive every
    * kernel below uses. Because `split(" ", -1)` partitions the string at
    * every space byte (0x20 never occurs inside a multi-byte UTF-8
    * sequence), a token (and a space-joined shingle of adjacent tokens) is
    * EXACTLY a byte range of the original text, so no token or shingle
    * String ever needs to materialize: the signature kernels run
    * zero-allocation over the text's own bytes (a byte array per row from
    * UTF8String.getBytes when the row isn't array-backed — nothing
    * per-token). Codepoints are decoded inline (ASCII bytes take the
    * one-branch fast path); input must be valid UTF-8, which Spark's
    * UTF8String guarantees for string columns. */
  private def polyHashRange(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = 0L
    var i = from
    while (i < until) {
      val b0 = bytes(i) & 0xff
      var cp = b0
      if (b0 < 0x80) i += 1
      else if ((b0 & 0xe0) == 0xc0) {
        cp = ((b0 & 0x1f) << 6) | (bytes(i + 1) & 0x3f); i += 2
      } else if ((b0 & 0xf0) == 0xe0) {
        cp = ((b0 & 0x0f) << 12) | ((bytes(i + 1) & 0x3f) << 6) |
          (bytes(i + 2) & 0x3f); i += 3
      } else {
        cp = ((b0 & 0x07) << 18) | ((bytes(i + 1) & 0x3f) << 12) |
          ((bytes(i + 2) & 0x3f) << 6) | (bytes(i + 3) & 0x3f); i += 4
      }
      h = (h * 131 + cp) % Dedup.P
    }
    h
  }

  private val Space = ' '.toByte

  /** Start offsets of the split(" ", -1) tokens of `bytes`, plus a
    * sentinel n+1 entry; token k spans [starts(k), starts(k+1) − 1). */
  private def tokenStarts(bytes: Array[Byte]): Array[Int] = {
    var n = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == Space) n += 1; i += 1 }
    val starts = new Array[Int](n + 1)
    starts(0) = 0
    var k = 1
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == Space) { starts(k) = i + 1; k += 1 }
      i += 1
    }
    starts(n) = bytes.length + 1 // sentinel: end of token k = starts(k+1)-1
    starts
  }

  private val MinA = Dedup.MinHashFns.map(_._2).toArray
  private val MinB = Dedup.MinHashFns.map(_._3).toArray
  private val SimA = Dedup.SimHashFns.map(_._2).toArray
  private val SimB = Dedup.SimHashFns.map(_._3).toArray

  /** All 16 minhashes of the text's word-3-shingles in one pass: for each
    * shingle, sid = polyHash(shingle bytes); mh_h = min over shingles of
    * (a_h·sid + b_h) mod p. Duplicates can't change a min, so no distinct
    * pass is needed. Returns an EMPTY array when the text has <3 tokens (no
    * shingles) — callers filter on size, matching the relational formulation
    * where such docs simply have no signature row. */
  def minHashSig(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val starts = tokenStarts(bytes)
    val nToks = starts.length - 1
    if (nToks < 3) return new GenericArrayData(Array.empty[Any])
    val mins = Array.fill(MinA.length)(Long.MaxValue)
    var i = 0
    while (i + 2 < nToks) {
      // shingle i = bytes [starts(i), end of token i+2) — the exact
      // space-joined representation
      val sid = polyHashRange(bytes, starts(i), starts(i + 3) - 1)
      var h = 0
      while (h < mins.length) {
        val v = (MinA(h) * sid + MinB(h)) % Dedup.P
        if (v < mins(h)) mins(h) = v
        h += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(Long.box(_): Any))
  }

  /** 32-bit SimHash over unigram occurrences: each token contributes
    * ±1 per hash — summing per occurrence equals the tf-weighted sum over
    * distinct terms, so this row-local pass is exactly the relational
    * tf-formulation the oracle uses. */
  def simHash(text: UTF8String): Long = {
    val bytes = text.getBytes
    val starts = tokenStarts(bytes)
    val nToks = starts.length - 1
    val s = new Array[Long](SimA.length)
    var i = 0
    while (i < nToks) {
      val tid = polyHashRange(bytes, starts(i), starts(i + 1) - 1)
      var j = 0
      while (j < s.length) {
        s(j) += ((SimA(j) * tid + SimB(j)) % Dedup.P % 2) * 2 - 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < s.length) { if (s(j) > 0) out += 1L << j; j += 1 }
    out
  }

  /** Codepoints in the byte range — the unit DuckDB's `length()` counts,
    * so gram "mass" agrees across engines on any valid UTF-8. */
  private def cpLen(bytes: Array[Byte], from: Int, until: Int): Long = {
    var n = 0L
    var i = from
    while (i < until) { if ((bytes(i) & 0xc0) != 0x80) n += 1; i += 1 }
    n
  }

  /** polyHash of each space-joined `n`-token gram at token offsets 0,
    * stride, 2·stride, … — one row-local pass, zero allocation per gram
    * (a gram is an exact byte range of the text, see [[polyHashRange]]).
    * `partial = true` keeps a trailing gram of fewer than `n` tokens
    * (non-overlapping CHUNKS keep their tail); `partial = false` drops it
    * (overlapping SHINGLES never emit short grams). */
  def gramHashes(text: UTF8String, n: Int, stride: Int, partial: Boolean): ArrayData = {
    val bytes = text.getBytes
    val starts = tokenStarts(bytes)
    val nToks = starts.length - 1
    val count =
      if (partial) (nToks + stride - 1) / stride
      else if (nToks < n) 0
      else (nToks - n) / stride + 1
    val out = new Array[Any](count)
    var k = 0
    while (k < count) {
      val i = k * stride
      val e = math.min(i + n, nToks)
      out(k) = Long.box(polyHashRange(bytes, starts(i), starts(e) - 1))
      k += 1
    }
    new GenericArrayData(out)
  }

  private val RepKeyBase = 1L << 40 // key = count·2^40 + mass; mass < 2^40

  /** Gopher-style repetition statistics in one row-local pass:
    * `[key1, key2, key3, dup3mass]` where keyN = max over the doc's word
    * N-gram hash-groups of `count·2^40 + Σ length(gram)` (the most-repeated
    * gram, mass-tie-broken — `key mod 2^40` recovers its character mass)
    * and dup3mass = Σ over 3-gram groups occurring ≥ 2 times of their
    * summed character mass. Groups are keyed by polyHash of the gram bytes
    * and masses are summed PER OCCURRENCE, so a (vanishingly rare) hash
    * collision folds identically in the DuckDB oracle, which groups by the
    * same hash and sums the same lengths. Missing gram sizes (docs shorter
    * than N tokens) yield key 0. Rae et al. 2021 (Gopher) §A1.1 defines the
    * rule family; N and the dup size are parameters — 1/2/3 + dup-3 are
    * the registered query's choices. */
  def repStats(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val starts = tokenStarts(bytes)
    val nToks = starts.length - 1
    val out = new Array[Any](4)
    var slot = 0
    var dup3 = 0L
    Array(1, 2, 3).foreach { n =>
      var key = 0L
      if (nToks >= n) {
        val m = new java.util.HashMap[Long, Array[Long]]()
        var i = 0
        while (i + n <= nToks) {
          val from = starts(i); val until = starts(i + n) - 1
          val h = polyHashRange(bytes, from, until)
          val cm = m.get(h)
          if (cm == null) m.put(h, Array(1L, cpLen(bytes, from, until)))
          else { cm(0) += 1; cm(1) += cpLen(bytes, from, until) }
          i += 1
        }
        val it = m.values().iterator()
        while (it.hasNext) {
          val cm = it.next()
          val k = cm(0) * RepKeyBase + cm(1)
          if (k > key) key = k
          if (n == 3 && cm(0) >= 2) dup3 += cm(1)
        }
      }
      out(slot) = Long.box(key)
      slot += 1
    }
    out(3) = Long.box(dup3)
    new GenericArrayData(out)
  }

  /** Order-sensitive rolling fingerprint: h ← (31·h + polyHash(token)) mod
    * (10^9+7) over tokens in document order. */
  def fingerprint(text: UTF8String): Long = {
    val bytes = text.getBytes
    val starts = tokenStarts(bytes)
    val nToks = starts.length - 1
    var h = 0L
    var i = 0
    while (i < nToks) {
      h = (h * 31 + polyHashRange(bytes, starts(i), starts(i + 1) - 1)) %
        TextOps.HashP
      i += 1
    }
    h
  }
}

/** poly_hash(string) → long. */
case class PolyHashExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_poly_hash requires a string argument, got $dt")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_poly_hash"
  override def nullSafeEval(input: Any): Any =
    HashKernels.polyHash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.HashKernels.polyHash($c)")
  override protected def withNewChildInternal(newChild: Expression): PolyHashExpr =
    copy(child = newChild)
}

/** minhash_sig(text) → array<long>[16]; empty when <3 tokens. */
case class MinHashSigExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_sig requires a string argument, got $dt")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"
  override def nullSafeEval(input: Any): Any =
    HashKernels.minHashSig(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.HashKernels.minHashSig($c)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

/** sim_hash(text) → long. */
case class SimHashExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_sim_hash requires a string argument, got $dt")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sim_hash"
  override def nullSafeEval(input: Any): Any =
    HashKernels.simHash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.HashKernels.simHash($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}

/** fingerprint(text) → long. */
case class FingerprintExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_fingerprint requires a string argument, got $dt")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_fingerprint"
  override def nullSafeEval(input: Any): Any =
    HashKernels.fingerprint(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.HashKernels.fingerprint($c)")
  override protected def withNewChildInternal(newChild: Expression): FingerprintExpr =
    copy(child = newChild)
}

/** gram_hashes(text, n, stride, partial) → array<long> of space-joined
  * n-token-gram hashes; see [[HashKernels.gramHashes]]. */
case class GramHashesExpr(child: Expression, n: Int, stride: Int, partial: Boolean)
    extends UnaryExpression {
  require(n > 0 && stride > 0, s"graft_gram_hashes needs n > 0, stride > 0 (got $n, $stride)")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_gram_hashes requires a string argument, got $dt")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_gram_hashes"
  override def nullSafeEval(input: Any): Any =
    HashKernels.gramHashes(input.asInstanceOf[UTF8String], n, stride, partial)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.text.HashKernels.gramHashes($c, $n, $stride, $partial)")
  override protected def withNewChildInternal(newChild: Expression): GramHashesExpr =
    copy(child = newChild)
}

/** rep_stats(text) → array<long>[4]: [key1, key2, key3, dup3mass]; see
  * [[HashKernels.repStats]]. */
case class RepStatsExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_rep_stats requires a string argument, got $dt")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_rep_stats"
  override def nullSafeEval(input: Any): Any =
    HashKernels.repStats(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.HashKernels.repStats($c)")
  override protected def withNewChildInternal(newChild: Expression): RepStatsExpr =
    copy(child = newChild)
}

object HashExpressions {
  def polyHash(c: Column): Column = Bridge.column(PolyHashExpr(Bridge.expression(c)))
  def minHashSig(c: Column): Column = Bridge.column(MinHashSigExpr(Bridge.expression(c)))
  def simHash(c: Column): Column = Bridge.column(SimHashExpr(Bridge.expression(c)))
  def fingerprint(c: Column): Column = Bridge.column(FingerprintExpr(Bridge.expression(c)))
  def gramHashes(c: Column, n: Int, stride: Int, partial: Boolean): Column =
    Bridge.column(GramHashesExpr(Bridge.expression(c), n, stride, partial))
  def repStats(c: Column): Column = Bridge.column(RepStatsExpr(Bridge.expression(c)))
}
