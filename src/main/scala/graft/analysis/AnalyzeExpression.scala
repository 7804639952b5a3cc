package graft.analysis

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the stopworded analysis chain — the
  * perf-tier upgrade over the UDF (SURVEY §2.12): `doGenCode` emits a plain
  * static call, so the operator stays inside whole-stage codegen with no
  * Scala-closure serialization or Option-boxing on the hot path. Semantics
  * are byte-identical to [[Analyzer.analyzeStop]] (same code underneath). */
case class AnalyzeStopExpr(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_analyze_stop requires a string argument, got ${child.dataType}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_analyze_stop"

  override def nullSafeEval(input: Any): Any =
    AnalyzeStopExpr.analyze(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.analysis.AnalyzeStopExpr.analyze($c)")

  override protected def withNewChildInternal(newChild: Expression): AnalyzeStopExpr =
    copy(child = newChild)
}

object AnalyzeStopExpr {
  /** Static entry the generated code calls. */
  def analyze(s: UTF8String): ArrayData = {
    val toks = Analyzer.analyzeStop(s.toString)
    val out = new Array[Any](toks.length)
    var i = 0
    while (i < toks.length) { out(i) = UTF8String.fromString(toks(i)); i += 1 }
    new GenericArrayData(out)
  }

  /** Column API. */
  def analyzeStop(c: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      AnalyzeStopExpr(org.apache.spark.sql.graftbridge.Bridge.expression(c)))

  /** SQL registration: `SELECT graft_analyze_stop(text) FROM ...`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_analyze_stop", exprs => AnalyzeStopExpr(exprs.head), "scala_udf")
}
