package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, TimestampNTZType, TimestampType}

/** Binary search over a sorted array: greatest element `<= key`, or
  * null when every element is greater. The array is expected sorted
  * ascending with no nulls (we always build it with
  * `sort_array(collect_set(...))`).
  *
  * This is the core of the scale-safe as-of join (SURVEY.md §2.3
  * `join_asof`, §4.3 ladder): the low-cardinality key set is broadcast
  * as ONE sorted array and each fact row does an O(log n) probe with
  * zero allocation, inside whole-stage codegen — replacing the
  * round-1 `array_max(filter(...))` plan that allocated a filtered
  * copy of the array per row (20 s at sf0.1; see VERDICT.md).
  *
  * Element types are those whose physical representation is 8-byte
  * (TimestampType, LongType) — enough for as-of keys (timestamps,
  * bigint event-time) without a generic ordering dispatch in the hot
  * loop.
  */
case class ArrayMaxLE(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elementType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    left.dataType match {
      // containsNull must be false: the binary search reads raw 8-byte
      // slots, and a null element would silently read as 0
      case ArrayType(et, false)
          if (et == TimestampType || et == TimestampNTZType || et == LongType)
            && et == right.dataType => TypeCheckSuccess
      case _ => TypeCheckFailure(
        s"array_max_le needs (array<timestamp|bigint> without nulls, same-type key); " +
          s"got (${left.dataType.sql}, ${right.dataType.sql})")
    }
  }

  override def dataType: DataType = elementType
  override def nullable: Boolean = true
  override def prettyName: String = "array_max_le"

  override def nullSafeEval(arr: Any, key: Any): Any = {
    val a = arr.asInstanceOf[ArrayData]
    val k = key.asInstanceOf[Long]
    var lo = 0
    var hi = a.numElements() - 1
    var res = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (a.getLong(mid) <= k) { res = mid; lo = mid + 1 }
      else hi = mid - 1
    }
    if (res < 0) null else java.lang.Long.valueOf(a.getLong(res))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (arr, key) => {
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val res = ctx.freshName("res")
      val mid = ctx.freshName("mid")
      s"""
         |int $lo = 0;
         |int $hi = $arr.numElements() - 1;
         |int $res = -1;
         |while ($lo <= $hi) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  if ($arr.getLong($mid) <= $key) { $res = $mid; $lo = $mid + 1; }
         |  else { $hi = $mid - 1; }
         |}
         |if ($res < 0) { ${ev.isNull} = true; }
         |else { ${ev.value} = $arr.getLong($res); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ArrayMaxLE {
  /** DataFrame-API entry: greatest element of sorted `arr` <= `key`. */
  def apply(arr: Column, key: Column): Column =
    Shim.column(ArrayMaxLE(Shim.expression(arr), Shim.expression(key)))
}
