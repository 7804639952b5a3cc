package graft.spark

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** SparkSessionExtensions entry point: exposes the engine's codegen-native
  * Catalyst expressions as SQL functions, so `spark.sql(...)` pipelines
  * (and pure-SQL users of the library) reach the same kernels the
  * DataFrame API uses — whole-stage-codegen'd, never UDF-tier.
  *
  * Activate at session build:
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.spark.GraftExtensions")
  *     // or .withExtensions(new GraftExtensions)
  * }}}
  * or on a running session with [[GraftExtensions.registerAll]].
  *
  * Registered surface (each function IS the corresponding expression —
  * semantics and goldens identical to the Column API):
  *
  *  - `graft_analyze_stop(text)` → array<string>: the stopword analysis
  *    chain ([[graft.analysis.AnalyzeStopExpr]])
  *  - `graft_analyze_tf(text)` → struct<dl, tfs>: fused analyze + per-doc
  *    tf ([[graft.analysis.AnalyzeTfExpr]])
  *  - `graft_field_tf(vals, 'chain')` → struct<dl, tfs(+pos)>: per-field
  *    multi-valued analysis under one of the four chains
  *    ([[graft.analysis.FieldTfExpr]]; chain must be a string literal)
  *  - `graft_poly_hash(text)` / `graft_sim_hash(text)` /
  *    `graft_fingerprint(text)` → bigint; `graft_minhash_sig(text)` →
  *    array<bigint> ([[graft.text.HashKernels]] kernels)
  *  - `graft_shingles(text)` → array<string>
  *    ([[graft.dedup.ShinglesExpr]])
  *  - `graft_rep_stats(text)` → array<bigint>[4]; `graft_gram_hashes(text,
  *    n, stride, partial)` → array<bigint> (n/stride/partial must be
  *    literals) ([[graft.text.HashKernels]] kernels)
  *  - `graft_lsh_buckets(vec)` → array<int>
  *    ([[graft.sim.LshBucketsExpr]])
  *  - `graft_dot(vec, vec)` → double ([[graft.sim.DotExpr]])
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def fn(name: String, arity: Int)(
      build: Seq[Expression] => Expression): FunctionDescription =
    (FunctionIdentifier(name),
      new ExpressionInfo(classOf[GraftExtensions].getName, name),
      (args: Seq[Expression]) => {
        require(args.length == arity,
          s"$name expects $arity argument(s), got ${args.length}")
        build(args)
      })

  /** The registered function set — shared by the build-time extension and
    * the running-session route so the two can never diverge. */
  val functions: Seq[FunctionDescription] = Seq(
    fn("graft_analyze_stop", 1)(a => graft.analysis.AnalyzeStopExpr(a.head)),
    fn("graft_analyze_tf", 1)(a => graft.analysis.AnalyzeTfExpr(a.head)),
    fn("graft_field_tf", 2) { a =>
      val kind = a(1) match {
        case Literal(s: UTF8String, StringType) => s.toString
        case other => throw new IllegalArgumentException(
          s"graft_field_tf chain must be a string literal, got $other")
      }
      graft.analysis.FieldTfExpr(a.head, kind)
    },
    fn("graft_poly_hash", 1)(a => graft.text.PolyHashExpr(a.head)),
    fn("graft_minhash_sig", 1)(a => graft.text.MinHashSigExpr(a.head)),
    fn("graft_sim_hash", 1)(a => graft.text.SimHashExpr(a.head)),
    fn("graft_fingerprint", 1)(a => graft.text.FingerprintExpr(a.head)),
    fn("graft_shingles", 1)(a => graft.dedup.ShinglesExpr(a.head)),
    fn("graft_rep_stats", 1)(a => graft.text.RepStatsExpr(a.head)),
    fn("graft_gram_hashes", 4) { a =>
      def intLit(e: Expression, what: String): Int = e match {
        case Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"graft_gram_hashes $what must be an integer literal, got $other")
      }
      val partial = a(3) match {
        case Literal(v: Boolean, _) => v
        case other => throw new IllegalArgumentException(
          s"graft_gram_hashes partial must be a boolean literal, got $other")
      }
      graft.text.GramHashesExpr(a.head, intLit(a(1), "n"), intLit(a(2), "stride"), partial)
    },
    fn("graft_lsh_buckets", 1)(a => graft.sim.LshBucketsExpr(a.head)),
    fn("graft_dot", 2)(a => graft.sim.DotExpr(a(0), a(1))))

  /** Register every function on an already-running session (extensions
    * otherwise apply only at session build). Idempotent. */
  def registerAll(spark: SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      org.apache.spark.sql.graftbridge.Bridge
        .registerFunction(spark, ident, info, builder)
    }
}
