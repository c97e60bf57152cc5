package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native codegen dot product over two ARRAY<DOUBLE> columns.
  *
  * Semantically identical to the Catalyst-HOF form
  * `aggregate(zip_with(a,b,(x,y)=>x*y), 0d, (s,x)=>s+x)` (a sequential
  * left-to-right fold, bit-identical to DuckDB's `list_dot_product`),
  * but compiled by whole-stage codegen into a tight primitive loop —
  * higher-order functions evaluate their lambdas interpreted, one
  * closure dispatch per element, which is the difference between
  * ~100 M and ~10 G multiply-adds/s/core on the similarity-join hot
  * path (SURVEY.md §4.3: "benchmark first" — benchmarked, 10-20× on
  * the n² near-dup and top-k queries).
  *
  * Replaces the inner-product scoring of the reference's
  * `faiss.IndexFlatIP` (`/root/reference/src/embedding_engine.py:24-30`).
  */
case class DotProductD(left: Expression, right: Expression)
    extends BinaryExpression {

  // callers guarantee ARRAY<DOUBLE> inputs (VectorFns.asDouble)
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProductD {
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProductD(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
