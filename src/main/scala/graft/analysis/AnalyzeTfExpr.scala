package graft.analysis

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused analyze + per-doc term-frequency expression:
  * `text → struct<dl:int, tfs:array<struct<term:string, tf:int>>>` with
  * `tfs` term-sorted and `dl` = token count after the stop chain (= Σ tf).
  *
  * This is the shuffle-elimination kernel of the index build: computing tf
  * per (term, doc) as a row-local fold means the corpus-sized token stream
  * NEVER enters a shuffle — the classic `posexplode → groupBy(term, doc_id)`
  * plan shuffles one row per distinct (term, doc) pair (~10^14 rows at the
  * 10^12-doc design point) just to count within a single document, which is
  * embarrassingly local work. Downstream, dl rides in the same row, so the
  * tf⋈dl join disappears too. Semantics are pinned to
  * [[Analyzer.analyzeStop]] (same tokens, same counts — IndexSpec asserts
  * equality against the groupBy formulation). */
case class AnalyzeTfExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_analyze_tf requires a string argument, got ${child.dataType}")

  override def dataType: DataType = AnalyzeTfExpr.OutType
  override def prettyName: String = "graft_analyze_tf"

  override def nullSafeEval(input: Any): Any =
    AnalyzeTfExpr.analyzeTf(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.analysis.AnalyzeTfExpr.analyzeTf($c)")

  override protected def withNewChildInternal(newChild: Expression): AnalyzeTfExpr =
    copy(child = newChild)
}

object AnalyzeTfExpr {

  val TfsType: ArrayType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("tf", IntegerType, nullable = false))), containsNull = false)

  val OutType: StructType = StructType(Seq(
    StructField("dl", IntegerType, nullable = false),
    StructField("tfs", TfsType, nullable = false)))

  /** Static entry the generated code calls. */
  def analyzeTf(s: UTF8String): InternalRow = {
    val (dl, counts) = Analyzer.analyzeStopCounts(s.toString)
    toRow(dl, counts)
  }

  /** (dl, term→tf sorted map) → struct<dl, tfs> InternalRow. */
  private[analysis] def toRow(dl: Int,
      counts: java.util.TreeMap[String, Int]): InternalRow = {
    val arr = new Array[Any](counts.size)
    var j = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      arr(j) = new GenericInternalRow(
        Array[Any](UTF8String.fromString(e.getKey), e.getValue))
      j += 1
    }
    new GenericInternalRow(Array[Any](dl, new GenericArrayData(arr)))
  }

  /** Column API. */
  def analyzeTf(c: Column): Column =
    Bridge.column(AnalyzeTfExpr(Bridge.expression(c)))
}

/** Fused per-field analyze + tf + POSITIONS over a MULTI-VALUED field:
  * `array<string> → struct<dl, tfs: array<struct<term,tf,pos>>>` under one
  * of the four analyzer chains ([[Analyzer.Chains]]) — the per-field twin
  * of [[AnalyzeTfExpr]], carrying the reference's ES array-field semantics
  * (values concatenate into one token stream; keyword chains emit one
  * token per non-empty value — elastic/settings.go:87-138) plus the
  * position stream ES `text` fields index by default (stopword gaps,
  * multi-value increment gap — [[Analyzer.chainCountsPos]]). Row-local
  * like its twin: per-field tf/dl/positions never shuffle a token
  * relation. */
case class FieldTfExpr(child: Expression, kind: String) extends UnaryExpression {
  require(Analyzer.Chains.contains(kind), s"unknown analyzer chain: $kind")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_field_tf requires array<string>, got $dt")
  }

  override def dataType: DataType = FieldTfExpr.OutTypePos
  override def prettyName: String = s"graft_field_tf_$kind"

  override def nullSafeEval(input: Any): Any =
    FieldTfExpr.analyzeTf(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], kind)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // kind ∈ Chains (identifiers only), so embedding it as a literal is safe
    defineCodeGen(ctx, ev, c =>
      s"""graft.analysis.FieldTfExpr.analyzeTf($c, "$kind")""")

  override protected def withNewChildInternal(newChild: Expression): FieldTfExpr =
    copy(child = newChild)
}

object FieldTfExpr {

  val TfsPosType: ArrayType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("tf", IntegerType, nullable = false),
    StructField("pos", ArrayType(IntegerType, containsNull = false),
      nullable = false))), containsNull = false)

  val OutTypePos: StructType = StructType(Seq(
    StructField("dl", IntegerType, nullable = false),
    StructField("tfs", TfsPosType, nullable = false)))

  /** Static entry the generated code calls: fold every non-null value of
    * the array into one (dl, tf, positions) row under the chain. */
  def analyzeTf(vals: org.apache.spark.sql.catalyst.util.ArrayData,
      kind: String): InternalRow = {
    val n = vals.numElements()
    val it = (0 until n).iterator
      .filterNot(vals.isNullAt)
      .map(i => vals.getUTF8String(i).toString)
    val (dl, accs) = Analyzer.chainCountsPos(kind, it)
    val arr = new Array[Any](accs.size)
    var j = 0
    val e = accs.entrySet().iterator()
    while (e.hasNext) {
      val kv = e.next()
      val acc = kv.getValue
      arr(j) = new GenericInternalRow(Array[Any](
        UTF8String.fromString(kv.getKey), acc.tf,
        new GenericArrayData(acc.positions)))
      j += 1
    }
    new GenericInternalRow(Array[Any](dl, new GenericArrayData(arr)))
  }

  /** Column API. */
  def analyzeTf(c: Column, kind: String): Column =
    Bridge.column(FieldTfExpr(Bridge.expression(c), kind))
}
