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
  * exact), so the DuckDB oracle's left-assoc `+` chain still matches —
  * INCLUDING its null semantics: an array shorter than `dim` or a null
  * element makes the SQL `a[i]` term NULL and the whole sum NULL, so
  * the kernel returns null for those inputs rather than silently
  * truncating. */
object VectorMath {

  /** Int8 quantization kernel: codes = floor(clamp(v,−1,1)·127 + 0.5)
    * per dimension plus the max absolute reconstruction error, ONE
    * compiled pass. The composed form (`transform` + `zip_with` +
    * `aggregate`) is three interpreted HOF traversals per vector with
    * two intermediate arrays. fp ops mirror the SQL tree exactly:
    * clamp = greatest(−1, least(1, v)), floor(x·127+0.5),
    * err = |clamp − code/127.0|, max seeded at 0.0. Per-element null/NaN
    * semantics match the composed form it replaced: a NULL element
    * yields a NULL code and is skipped by the error max (SQL
    * least/greatest skip nulls); a NaN element clamps to 1.0 → code 127
    * (Spark's least/greatest order NaN greater than every value). */
  def quantizeI8(a: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    if (a == null) return null
    val n = a.numElements()
    val codes = new Array[Any](n)
    var maxErr = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val v = a.getFloat(i).toDouble
        val c = if (v.isNaN) 1.0 else math.max(-1.0, math.min(1.0, v))
        val code = math.floor(c * 127.0 + 0.5).toInt
        codes(i) = code
        val err = math.abs(c - code.toDouble / 127.0)
        if (err > maxErr) maxErr = err
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](new org.apache.spark.sql.catalyst.util.GenericArrayData(codes), maxErr))
  }

  /** Boxed result: null when either array is shorter than `dim` or any
    * read element is null — matching SQL null propagation. */
  def dotF64OrNull(a: ArrayData, b: ArrayData, dim: Int): java.lang.Double = {
    if (a.numElements() < dim || b.numElements() < dim) return null
    var acc = 0.0
    var i = 0
    while (i < dim) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}

/** `quantize_i8(embedding)` → STRUCT<codes: ARRAY<INT>, max_abs_err:
  * DOUBLE> as a native expression. */
case class QuantizeI8(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with Serializable {

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("codes", ArrayType(
      org.apache.spark.sql.types.IntegerType)),
    org.apache.spark.sql.types.StructField("max_abs_err", DoubleType)))

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"quantize_i8 expects ARRAY<FLOAT>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    VectorMath.quantizeI8(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val row = ctx.freshName("qRow")
      s"""
         |org.apache.spark.sql.catalyst.InternalRow $row =
         |  graft.functions.VectorMath.quantizeI8($a);
         |if ($row == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $row;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "quantize_i8"
}

/** `dot_f64(a, b, dim)` over two ARRAY<FLOAT> columns → DOUBLE. */
case class DotF64(left: Expression, right: Expression, dim: Int)
  extends BinaryExpression with Serializable {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok && dim > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_f64 expects (ARRAY<FLOAT>, ARRAY<FLOAT>, dim > 0), got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}, dim=$dim")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorMath.dotF64OrNull(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("dotBoxed")
      s"""
         |java.lang.Double $boxed = graft.functions.VectorMath.dotF64OrNull($a, $b, $dim);
         |if ($boxed == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $boxed.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_f64"
}
