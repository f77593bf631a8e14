package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Intersection of two SORTED, DISTINCT, non-null long arrays, as one
  * merge walk in whole-stage codegen (r18, the [[SortedJaccard]]
  * discipline applied to the triangle core).
  *
  * `array_intersect(a, b)` builds an OpenHashSet over one side and an
  * intermediate growable buffer PER CALL; on the triangle-enumeration
  * hot path (one call per oriented edge, arrays are the oriented
  * adjacency lists) that allocation constant dominates the stage.
  * The merge walk writes straight into a primitive long[] and wraps
  * it as UnsafeArrayData — no hash set, no boxing.
  *
  * Caller contract (the TriCore adjacency invariant): both arrays are
  * sort_array'ed, distinct, and element-null-free. On such inputs the
  * result is the exact same SET as array_intersect, in ascending
  * order (array_intersect preserves left-side order, and the left
  * side is sorted — so even the order coincides). Null input array →
  * null (same as array_intersect).
  */
case class SortedIntersect(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckSuccess
      case _ => TypeCheckFailure(
        s"sorted_intersect needs (array<bigint>, array<bigint>); " +
          s"got (${left.dataType.sql}, ${right.dataType.sql})")
    }
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "sorted_intersect"

  override def nullSafeEval(a0: Any, b0: Any): Any = {
    val a = a0.asInstanceOf[ArrayData]
    val b = b0.asInstanceOf[ArrayData]
    val na = a.numElements(); val nb = b.numElements()
    val buf = new Array[Long](math.min(na, nb))
    var i = 0; var j = 0; var k = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { buf(k) = x; k += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(buf, k))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val k = ctx.freshName("k"); val buf = ctx.freshName("buf")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $na = $a.numElements(); int $nb = $b.numElements();
         |long[] $buf = new long[Math.min($na, $nb)];
         |int $i = 0; int $j = 0; int $k = 0;
         |while ($i < $na && $j < $nb) {
         |  long $x = $a.getLong($i); long $y = $b.getLong($j);
         |  if ($x == $y) { $buf[$k++] = $x; $i++; $j++; }
         |  else if ($x < $y) { $i++; } else { $j++; }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(java.util.Arrays.copyOf($buf, $k));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersect {
  /** DataFrame-API entry: sorted-merge intersection of two sorted
    * distinct long arrays. */
  def apply(a: Column, b: Column): Column =
    Shim.column(SortedIntersect(Shim.expression(a), Shim.expression(b)))
}
