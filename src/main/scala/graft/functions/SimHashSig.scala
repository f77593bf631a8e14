package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** 64-bit SimHash of a hashed-token array in ONE pass, inside
  * whole-stage codegen: bit j of the signature is set when at least
  * half the tokens have bit j set.
  *
  * Replaces the explode → 64-column bit-count hash-aggregate → packing
  * projection pipeline: that shape shuffles one row per TOKEN and
  * keeps 65 aggregation buffers per doc; this kernel keeps 64 counters
  * in a local int[] and emits the packed long per row — no explode, no
  * shuffle, no aggregate state. Value-identical to the aggregate
  * formulation (same majority rule `2*count >= n`, null elements
  * counted in n but not in any bit count, mirroring count(*) vs
  * sum-skips-null).
  *
  * Empty or null input yields null — the aggregate form simply had no
  * group for such docs, so callers filter nulls to keep parity.
  */
case class SimHashSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckSuccess
      case other => TypeCheckFailure(
        s"simhash_sig needs array<bigint>; got ${other.sql}")
    }
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n == 0) return null
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val x = a.getLong(i)
        var j = 0
        while (j < 64) {
          counts(j) += ((x >>> j) & 1L).toInt
          j += 1
        }
      }
      i += 1
    }
    var sim = 0L
    var j = 0
    while (j < 64) {
      if (2L * counts(j) >= n) sim |= (1L << j)
      j += 1
    }
    java.lang.Long.valueOf(sim)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val x = ctx.freshName("x")
      val sim = ctx.freshName("sim")
      s"""
         |int $n = $a.numElements();
         |if ($n == 0) { ${ev.isNull} = true; }
         |else {
         |  int[] $counts = new int[64];
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$a.isNullAt($i)) {
         |      long $x = $a.getLong($i);
         |      for (int $j = 0; $j < 64; $j++) {
         |        $counts[$j] += (int) (($x >>> $j) & 1L);
         |      }
         |    }
         |  }
         |  long $sim = 0L;
         |  for (int $j = 0; $j < 64; $j++) {
         |    if (2L * $counts[$j] >= $n) $sim |= (1L << $j);
         |  }
         |  ${ev.value} = $sim;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashSig {
  /** DataFrame-API entry: 64-bit SimHash of a hashed-token array. */
  def apply(tokenHashes: Column): Column =
    Shim.column(SimHashSig(Shim.expression(tokenHashes)))
}
