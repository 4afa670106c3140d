package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector hot path.
  *
  * The HOF formulation (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`) is
  * interpreted — every element allocates lambda-variable slots and boxes —
  * and sits inside the innermost loop of every similarity join. This
  * expression computes the IDENTICAL value (left-to-right fold, FLOAT
  * multiply widened into a DOUBLE accumulator — the sequence the DuckDB
  * oracle replays with list_reduce) inside whole-stage codegen: one tight
  * primitive loop, no allocation per element.
  */
case class FloatDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // inferred Seq[ArrayType] — AbstractDataType itself is private[sql]
  override def inputTypes = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getFloat(i) * y.getFloat(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) ($a.getFloat($i) * $b.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDot =
    copy(left = newLeft, right = newRight)
}

/** `Σ (a[i]-b[i])²` with the same determinism contract as [[FloatDot]]:
  * FLOAT subtract and multiply, widened into a DOUBLE accumulator,
  * left-to-right — the IVF quantizer's cell-assignment inner loop.
  */
case class FloatSqDist(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // inferred Seq[ArrayType] — AbstractDataType itself is private[sql]
  override def inputTypes = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_sq_dist"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = x.getFloat(i) - y.getFloat(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  float $d = $a.getFloat($i) - $b.getFloat($i);
         |  $acc += (double) ($d * $d);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatSqDist =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** `Σ a[i]·b[i]` over FLOAT arrays as a codegen'd column — drop-in for
    * the interpreted HOF fold, bit-identical result.
    */
  def floatDot(a: Column, b: Column): Column =
    ColumnBridge.column(
      FloatDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** `Σ (a[i]-b[i])²` over FLOAT arrays as a codegen'd column. */
  def floatSqDist(a: Column, b: Column): Column =
    ColumnBridge.column(
      FloatSqDist(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
