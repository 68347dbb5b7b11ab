package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Float-vector dot product as a native expression.
  *
  * The composable form — `aggregate(zip_with(a, b, _*_), 0.0, _+_)` — is
  * a higher-order function, which Spark evaluates interpreted (lambda
  * expression eval per element, no whole-stage codegen). For an n²
  * verify stage that is the hot loop. This kernel is one compiled loop;
  * the fp result is bit-identical to the left-fold (sequential
  * `acc += a[i]·b[i]` in doubles, same order, float→double widening
  * exact), so the DuckDB oracle's left-assoc `+` chain still matches. */
object VectorMath {
  def dotF64(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }
}

/** `dot_f64(a, b)` over two ARRAY<FLOAT> columns → DOUBLE. */
case class DotF64(left: Expression, right: Expression)
  extends BinaryExpression with Serializable {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_f64 expects (ARRAY<FLOAT>, ARRAY<FLOAT>), got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorMath.dotF64(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorMath.dotF64($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_f64"
}
