package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Count of common elements between two SORTED, DISTINCT ARRAY<STRING>
  * columns — a single codegen'd merge walk, O(n+m) with zero allocation.
  *
  * Replaces `size(array_intersect(a,b))` on the near-duplicate
  * self-join hot path: the builtin intersect builds a hash set per
  * PAIR (interpreted, allocating); with millions of candidate pairs at
  * 100 TB that is the entire cost of Jaccard verification. Jaccard
  * follows as c/(|a|+|b|−c) with no union materialization at all.
  *
  * Callers must pre-sort with `array_sort(array_distinct(...))` — done
  * once per document before the join's exchange, not per pair.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (na, nb) = (x.numElements(), y.numElements())
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val cmp = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val cmp = ctx.freshName("cmp")
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      s"""
         |int $na = $a.numElements(); int $nb = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $na && $j < $nb) {
         |  int $cmp = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |  if ($cmp == 0) { $c++; $i++; $j++; }
         |  else if ($cmp < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Same merge walk over SORTED, DISTINCT ARRAY<LONG> — primitive
  * comparisons, no per-element object allocation (pairs with
  * [[TextSignatures.WordBigramHashes]] on the n² dedup paths). */
case class SortedIntersectCountLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (na, nb) = (x.numElements(), y.numElements())
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val xa = x.getLong(i); val yb = y.getLong(j)
      if (xa == yb) { c += 1; i += 1; j += 1 }
      else if (xa < yb) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val xa = ctx.freshName("xa")
      val yb = ctx.freshName("yb")
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      s"""
         |int $na = $a.numElements(); int $nb = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $na && $j < $nb) {
         |  long $xa = $a.getLong($i); long $yb = $b.getLong($j);
         |  if ($xa == $yb) { $c++; $i++; $j++; }
         |  else if ($xa < $yb) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Popcount of the bitwise AND of two equal-width ARRAY<LONG> bitmask
  * columns — set-intersection cardinality when sets are encoded as
  * fixed-width bitsets over a small global vocabulary. One fused
  * AND+popcount loop, no branches, no allocation: on a dense-vocab
  * corpus (every doc shares most grams) this turns the per-pair verify
  * from an O(n+m) merge walk with data-dependent branches into W
  * `Long.bitCount` instructions (W = vocab/64), ~25× cheaper — the
  * lever that makes an all-pairs or near-all-pairs verify feasible
  * when prefix filtering has no selectivity (see
  * Graft.containmentPairsFromShingles' dense path). */
case class BitsetIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0; var c = 0
    while (i < n) {
      c += java.lang.Long.bitCount(x.getLong(i) & y.getLong(i))
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val c = ctx.freshName("c")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $i = 0; int $c = 0;
         |while ($i < $n) {
         |  $c += java.lang.Long.bitCount($a.getLong($i) & $b.getLong($i));
         |  $i++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  def sortedIntersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(
      SortedIntersectCount(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def sortedIntersectCountLong(a: Column, b: Column): Column =
    ColumnBridge.column(
      SortedIntersectCountLong(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def bitsetIntersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(
      BitsetIntersectCount(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
