package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, NullType}

/** Native Catalyst expression for the sequential dot product of two
  * double arrays — the inner loop of every cosine-similarity operator
  * (brute-force/LSH/IVF top-k, embedding stats).
  *
  * Why an Expression and not a UDF: the per-pair ScalaUDF boundary costs
  * two ArrayData→Array[Double] copies plus closure dispatch, and breaks
  * whole-stage codegen of the surrounding operator. `doGenCode` emits a
  * direct static call over the unsafe ArrayData — no copies, null check
  * fused. Accumulation order is left-to-right, IEEE-identical to the
  * UDF formulation and DuckDB's `list_dot_product` (oracle parity).
  *
  * A null ARRAY yields null (nullIntolerant). Null ELEMENTS are
  * rejected loudly — reading a null slot as 0.0 would return a
  * wrong-looking number silently, and embedding vectors never contain
  * them (the parquet element type is merely declared nullable).
  */
case class ArrayDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) | NullType => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"array_dot requires two array<double> arguments, got " +
        s"(${left.dataType}, ${right.dataType})")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "array_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ArrayDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ArrayDot.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
}

object ArrayDot {
  /** Static hot path shared by interpreted eval and generated code —
    * reads doubles straight out of the (unsafe) ArrayData. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(
          s"array_dot: null element at index $i (vectors must be dense)")
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }

  /** Injection for `SparkSessionExtensions`, exposing the expression to
    * SQL as `array_dot(a, b)`. */
  val functionDescriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("array_dot"),
    new ExpressionInfo(classOf[ArrayDot].getName, "array_dot"),
    (children: Seq[Expression]) => {
      require(children.size == 2,
        s"array_dot takes exactly 2 arguments, got ${children.size}")
      ArrayDot(children.head, children(1))
    })
}
