package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** [[SignBuckets]]'s oracle-checkable sibling: all `tables × bits`
  * sign projections of a float vector in ONE codegen pass, with two
  * changes that make the result reproducible by a second engine:
  *
  *  - the projection matrix is EXPLICIT (`signs`, lane-major ±1
  *    entries, derived from md5 by the caller so DuckDB can derive
  *    the identical matrix in SQL), instead of xxhash64-seeded
  *    pseudo-randoms only this JVM can compute;
  *  - each component is quantized to an exact integer FIRST —
  *    `(long) floor((double) x * 1000.0 + 0.5)` — and the dot
  *    products accumulate in int64, so the sign test is exact integer
  *    arithmetic with NO cross-engine float-summation-order hazard
  *    (the evt_threshold_alerts_verified cents discipline applied to
  *    vectors). A bit is set iff its dot >= 0.
  *
  * Same execution shape as the production kernel — no explode, no
  * shuffle, no aggregation buffers; one `long[lanes]` per row. Input
  * whose length does not match the matrix (or is empty, or contains
  * a null element) yields null, and callers filter those rows so the
  * Spark side and the oracle's `len(embedding) = dims` guard agree.
  */
case class SignBucketsExact(child: Expression, tables: Int, bits: Int,
    signs: Array[Byte]) extends UnaryExpression {

  require(tables > 0 && bits > 0 && bits <= 63,
    s"need tables > 0 and 0 < bits <= 63, got ($tables, $bits)")
  require(signs.nonEmpty && signs.length % (tables * bits) == 0,
    s"signs length ${signs.length} must be a multiple of lanes ${tables * bits}")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckSuccess
      case other => TypeCheckFailure(
        s"sign_buckets_exact needs array<float>; got ${other.sql}")
    }
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "sign_buckets_exact"

  private def lanes: Int = tables * bits
  private def dims: Int = signs.length / lanes

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != dims) return null
    val dots = new Array[Long](lanes)
    var d = 0
    while (d < n) {
      if (a.isNullAt(d)) return null
      val q = math.floor(a.getFloat(d).toDouble * 1000.0 + 0.5).toLong
      var i = 0
      while (i < lanes) {
        dots(i) += signs(i * dims + d) * q
        i += 1
      }
      d += 1
    }
    val buckets = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var acc = 0L
      var b = 0
      while (b < bits) {
        if (dots(t * bits + b) >= 0) acc |= (1L << b)
        b += 1
      }
      buckets(t) = acc
      t += 1
    }
    new GenericArrayData(buckets)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val signsRef = ctx.addReferenceObj("signs", signs, "byte[]")
      val n = ctx.freshName("n")
      val dots = ctx.freshName("dots")
      val buckets = ctx.freshName("buckets")
      val bad = ctx.freshName("bad")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val q = ctx.freshName("q")
      val t = ctx.freshName("t")
      val b = ctx.freshName("b")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |boolean $bad = ($n != $dims);
         |if (!$bad) {
         |  long[] $dots = new long[$lanes];
         |  for (int $d = 0; $d < $n && !$bad; $d++) {
         |    if ($a.isNullAt($d)) { $bad = true; }
         |    else {
         |      long $q = (long) Math.floor((double) $a.getFloat($d) * 1000.0 + 0.5);
         |      for (int $i = 0; $i < $lanes; $i++) {
         |        $dots[$i] += $signsRef[$i * $dims + $d] * $q;
         |      }
         |    }
         |  }
         |  if (!$bad) {
         |    long[] $buckets = new long[$tables];
         |    for (int $t = 0; $t < $tables; $t++) {
         |      long $acc = 0L;
         |      for (int $b = 0; $b < $bits; $b++) {
         |        if ($dots[$t * $bits + $b] >= 0L) $acc |= (1L << $b);
         |      }
         |      $buckets[$t] = $acc;
         |    }
         |    ${ev.value} =
         |      new org.apache.spark.sql.catalyst.util.GenericArrayData($buckets);
         |  }
         |}
         |if ($bad) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SignBucketsExact {
  /** DataFrame-API entry: exact-arithmetic LSH sign-projection buckets
    * with a caller-supplied lane-major ±1 matrix. */
  def apply(embedding: Column, tables: Int, bits: Int,
      signs: Array[Byte]): Column =
    Shim.column(SignBucketsExact(Shim.expression(embedding), tables, bits, signs))
}
