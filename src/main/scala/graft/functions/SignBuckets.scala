package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** All `tables × bits` sign-random-projection dot products of a float
  * vector in ONE pass, packed into `tables` LSH bucket values —
  * inside whole-stage codegen.
  *
  * Projection component (lane i, dimension d) is the same
  * deterministic value the declarative formulation derives:
  * `pmod(xxhash64(iL, CAST(d AS BIGINT)), 1000)/1000.0 - 0.5`, where
  * `xxhash64(lit(i), d)` folds its literal first child from seed 42
  * before mixing d — pre-mixed here exactly like [[MinHashSig]].
  *
  * Replaces posexplode → 32 codegen'd sum() aggregates → packing
  * projection: that shape shuffles one row per DIMENSION (n×64 rows)
  * and keeps 32 aggregation buffers per vector; this kernel keeps 32
  * running dots in a local double[] and emits the packed buckets per
  * row — no explode, no shuffle, no aggregate state. Value-identical:
  * same per-dimension accumulation order (ascending d), null elements
  * skipped exactly as sum() skips null products. Empty or null input
  * yields null (the aggregate form had no group).
  */
case class SignBuckets(child: Expression, tables: Int, bits: Int)
    extends UnaryExpression {

  require(tables > 0 && bits > 0 && bits <= 63,
    s"need tables > 0 and 0 < bits <= 63, got ($tables, $bits)")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckSuccess
      case other => TypeCheckFailure(
        s"sign_buckets needs array<float>; got ${other.sql}")
    }
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "sign_buckets"

  // xxhash64(lit(i), d) == hashLong(d, hashLong(i, 42L))
  @transient private lazy val seeds: Array[Long] =
    Array.tabulate(tables * bits)(i => XXH64.hashLong(i.toLong, 42L))

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n == 0) return null
    val lanes = tables * bits
    val dots = new Array[Double](lanes)
    var d = 0
    while (d < n) {
      if (!a.isNullAt(d)) {
        val v = a.getFloat(d).toDouble
        var i = 0
        while (i < lanes) {
          val h = XXH64.hashLong(d.toLong, seeds(i))
          val c = (((h % 1000L) + 1000L) % 1000L).toDouble / 1000.0 - 0.5
          dots(i) += v * c
          i += 1
        }
      }
      d += 1
    }
    val buckets = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var acc = 0L
      var b = 0
      while (b < bits) {
        if (dots(t * bits + b) > 0) acc |= (1L << b)
        b += 1
      }
      buckets(t) = acc
      t += 1
    }
    new GenericArrayData(buckets)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val seedsRef = ctx.addReferenceObj("seeds", seeds, "long[]")
      val lanes = tables * bits
      val n = ctx.freshName("n")
      val dots = ctx.freshName("dots")
      val buckets = ctx.freshName("buckets")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      val h = ctx.freshName("h")
      val t = ctx.freshName("t")
      val b = ctx.freshName("b")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n == 0) { ${ev.isNull} = true; }
         |else {
         |  double[] $dots = new double[$lanes];
         |  for (int $d = 0; $d < $n; $d++) {
         |    if (!$a.isNullAt($d)) {
         |      double $v = (double) $a.getFloat($d);
         |      for (int $i = 0; $i < $lanes; $i++) {
         |        long $h = org.apache.spark.sql.catalyst.expressions.XXH64
         |          .hashLong((long) $d, $seedsRef[$i]);
         |        $dots[$i] += $v * (((double) ((($h % 1000L) + 1000L) % 1000L)) / 1000.0 - 0.5);
         |      }
         |    }
         |  }
         |  long[] $buckets = new long[$tables];
         |  for (int $t = 0; $t < $tables; $t++) {
         |    long $acc = 0L;
         |    for (int $b = 0; $b < $bits; $b++) {
         |      if ($dots[$t * $bits + $b] > 0) $acc |= (1L << $b);
         |    }
         |    $buckets[$t] = $acc;
         |  }
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($buckets);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SignBuckets {
  /** DataFrame-API entry: LSH sign-projection buckets of a float
    * vector — `tables` longs of `bits` sign bits each. */
  def apply(embedding: Column, tables: Int, bits: Int): Column =
    Shim.column(SignBuckets(Shim.expression(embedding), tables, bits))
}
