package graft.sim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native Catalyst expressions for the embedding-similarity hot path.
  *
  * The pure-Column formulation (`zip_with` + `aggregate` folds) is correct
  * but the higher-order functions evaluate their lambdas interpreted — on
  * the O(n²) near-dup cross join that is 3 folds × 64 lambda invocations per
  * pair. These expressions compute the same left-to-right double-precision
  * sums in a tight primitive loop and stay inside whole-stage codegen
  * (`doGenCode` emits a static call), which is the SURVEY §2.12 upgrade
  * path: UDF/HOF first, native Expression where the profile demands it. */
object VecKernels {

  /** Σ (double)a(i) · (double)b(i), left-to-right — identical arithmetic to
    * `aggregate(zip_with(a,b,(x,y)=>x*y), 0.0, _+_)` over float arrays. */
  def dotFF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  /** All [[Ann.LshTables]] sign-buckets of one embedding in a single pass:
    * plane (t·bits+j) dotted left-to-right, bit j of bucket t set iff
    * dot > 0 — the same arithmetic as [[Ann.bucketCol]], 144 interpreted
    * folds collapsed into one primitive loop. */
  def lshBuckets(emb: ArrayData): ArrayData = {
    val dim = emb.numElements()
    val v = new Array[Double](dim)
    var i = 0
    while (i < dim) { v(i) = emb.getFloat(i).toDouble; i += 1 }
    val out = new Array[Any](Ann.LshTables)
    var t = 0
    while (t < Ann.LshTables) {
      var bucket = 0L
      var j = 0
      while (j < Ann.LshBits) {
        val planes = Planes(t * Ann.LshBits + j)
        var d = 0.0
        var k = 0
        val n = math.min(dim, planes.length)
        while (k < n) { d += v(k) * planes(k); k += 1 }
        if (d > 0) bucket += (1L << j)
        j += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Precomputed plane components [plane][component] (64-dim). */
  val Planes: Array[Array[Double]] =
    Array.tabulate(Ann.LshTables * Ann.LshBits, 64)((j, i) => Ann.planeComponent(j, i))
}

/** dot(a, b) over float/double arrays → double. */
case class DotExpr(left: Expression, right: Expression) extends BinaryExpression {
  private def ok(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires two array<float> arguments, got ${left.dataType}, ${right.dataType}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.dotFF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.sim.VecKernels.dotFF($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotExpr =
    copy(left = newLeft, right = newRight)
}

/** lsh_buckets(emb) → array<long> of the L per-table sign-buckets. */
case class LshBucketsExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_lsh_buckets requires an array<float> argument, got $dt")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_lsh_buckets"

  override def nullSafeEval(input: Any): Any =
    VecKernels.lshBuckets(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.sim.VecKernels.lshBuckets($c)")

  override protected def withNewChildInternal(newChild: Expression): LshBucketsExpr =
    copy(child = newChild)
}

object VecExpressions {
  def dot(a: Column, b: Column): Column =
    Bridge.column(DotExpr(Bridge.expression(a), Bridge.expression(b)))
  def lshBuckets(emb: Column): Column =
    Bridge.column(LshBucketsExpr(Bridge.expression(emb)))
}
