package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Jaccard similarity |a ∩ b| / |a ∪ b| of two SORTED, DISTINCT
  * long arrays, as one merge walk in whole-stage codegen — no hash-set
  * build, no intermediate array.
  *
  * The declarative form,
  * `size(array_intersect(a,b)) / size(array_union(a,b))`, builds an
  * OpenHashSet AND allocates a result array per call for each of the
  * two set operations; on the candidate-pair hot path of the near-dup
  * operators that constant dominates the whole query. Sorting is the
  * caller's contract (`sort_array(array_distinct(...))` once per
  * document — O(n log n) per row beats O(n) allocations per PAIR,
  * and the pair count is what explodes at scale).
  *
  * Returns the exact same value as the intersect/union form on sorted
  * distinct inputs. Null result on: null input, any null element, or
  * two empty arrays (0/0).
  */
case class SortedJaccard(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckSuccess
      case _ => TypeCheckFailure(
        s"sorted_jaccard needs (array<bigint>, array<bigint>); " +
          s"got (${left.dataType.sql}, ${right.dataType.sql})")
    }
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "sorted_jaccard"

  override def nullSafeEval(a0: Any, b0: Any): Any = {
    val a = a0.asInstanceOf[ArrayData]
    val b = b0.asInstanceOf[ArrayData]
    val na = a.numElements(); val nb = b.numElements()
    if (na + nb == 0) return null
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      if (a.isNullAt(i) || b.isNullAt(j)) return null
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    // a trailing null in the unwalked suffix still poisons the result
    while (i < na) { if (a.isNullAt(i)) return null; i += 1 }
    while (j < nb) { if (b.isNullAt(j)) return null; j += 1 }
    java.lang.Double.valueOf(inter.toDouble / (na + nb - inter).toDouble)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val inter = ctx.freshName("inter")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $na = $a.numElements(); int $nb = $b.numElements();
         |if ($na + $nb == 0) { ${ev.isNull} = true; }
         |else {
         |  int $i = 0; int $j = 0; int $inter = 0;
         |  while ($i < $na && $j < $nb) {
         |    if ($a.isNullAt($i) || $b.isNullAt($j)) { ${ev.isNull} = true; break; }
         |    long $x = $a.getLong($i); long $y = $b.getLong($j);
         |    if ($x == $y) { $inter++; $i++; $j++; }
         |    else if ($x < $y) { $i++; } else { $j++; }
         |  }
         |  while (!${ev.isNull} && $i < $na) {
         |    if ($a.isNullAt($i)) { ${ev.isNull} = true; } $i++;
         |  }
         |  while (!${ev.isNull} && $j < $nb) {
         |    if ($b.isNullAt($j)) { ${ev.isNull} = true; } $j++;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = ((double) $inter) / ((double) ($na + $nb - $inter));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedJaccard {
  /** DataFrame-API entry: Jaccard of two sorted distinct long arrays. */
  def apply(a: Column, b: Column): Column =
    Shim.column(SortedJaccard(Shim.expression(a), Shim.expression(b)))
}
