package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, NullType}

/** Native Catalyst expression for "how many thresholds of a SORTED
  * ladder are ≤ this value" — the per-row rank step of the quantile
  * Z-order layout ([[graft.warehouse.ZOrder.clusterQuantile]]).
  *
  * Why an Expression (r21, guide §4): the previous formulation,
  * `size(filter(array(<256 literals>), t => v >= t))`, is a
  * higher-order function — evaluated INTERPRETED, one boxed lambda
  * call per threshold per row (≤255 of them), and it blocks
  * whole-stage codegen of the surrounding projection. It was the
  * single hottest stage of q110 twice over (the range-exchange
  * samples the Z key, then the shuffle write recomputes it). This
  * expression binary-searches the same ladder (≤8 comparisons) in
  * generated code.
  *
  * Value parity with the HOF form, case by case: a NULL input counts
  * 0 (every `null >= t` drops the element); NaN counts 0 (every
  * `NaN >= t` is false); otherwise the count of `thr(i) <= v` over an
  * ascending distinct ladder — exactly what the upper-bound binary
  * search returns. Bit-identical ranks ⇒ identical Z keys ⇒ identical
  * layout, stats and pruning.
  */
case class LadderCount(child: Expression, ladder: Array[Double])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType | NullType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ladder_count requires a double argument, got $t")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "ladder_count"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L else LadderCount.count(v.asInstanceOf[Double], ladder)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val arr = ctx.addReferenceObj("ladder", ladder, "double[]")
    ev.copy(code =
      code"""
        ${c.code}
        long ${ev.value} = ${c.isNull} ? 0L :
          graft.functions.LadderCount.count(${c.value}, $arr);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): LadderCount =
    copy(child = newChild)
}

object LadderCount {
  /** Upper-bound binary search: count of ladder entries <= v over an
    * ascending (distinct) ladder. NaN compares false against every
    * threshold, hence 0 — the HOF form's behavior. */
  def count(v: Double, thr: Array[Double]): Long = {
    if (java.lang.Double.isNaN(v)) return 0L
    var lo = 0
    var hi = thr.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (thr(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo.toLong
  }
}
