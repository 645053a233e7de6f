package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Native vector expressions — the hot path of similarity search.
  * A custom Catalyst expression with codegen beats both higher-order
  * function folds (interpreted) and exploded dimension-joins (shuffle +
  * hash-agg per pair): one tight loop per pair inside whole-stage
  * codegen.
  */
object VectorExpressions {

  /** Σ floor(a(i)*b(i) * 1e12) as LONG — an exact, order-independent
    * scaled dot product over two double arrays. Divide by 1e12 for the
    * double value; same formula is reproducible in SQL oracles
    * (sum(cast(floor((x*y)*1e12) as bigint))). Null if either side is
    * null; arrays must have equal length.
    */
  case class DotScaledLong(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = LongType

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      var i = 0
      var acc = 0L
      val n = x.numElements()
      while (i < n) {
        acc += math.floor(x.getDouble(i) * y.getDouble(i) * 1e12).toLong
        i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        s"""
           |long $acc = 0L;
           |int $n = $a.numElements();
           |for (int $i = 0; $i < $n; $i++) {
           |  $acc += (long) Math.floor($a.getDouble($i) * $b.getDouble($i) * 1e12);
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): DotScaledLong =
      copy(l, r)
    override def prettyName: String = "dot_scaled_long"
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** Scaled-long dot product of two array<double> columns. */
  def dot_scaled(a: Column, b: Column): Column =
    column(DotScaledLong(expression(a), expression(b)))
}
