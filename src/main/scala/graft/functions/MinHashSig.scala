package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All `numHashes` MinHash lanes in ONE pass over the hashed-shingle
  * array, inside whole-stage codegen.
  *
  * The declarative formulation — `numHashes` separate
  * `array_min(transform(sh, h -> xxhash64(seed_i, h)))` projections —
  * walks the array once per lane through the interpreted higher-order
  * `transform`, allocating a fresh array each time: 32 lanes × |sh|
  * boxed evaluations per document. This kernel keeps 32 running minima
  * in a local long[] and visits each element once, calling the same
  * XXH64 primitive Spark's `xxhash64` uses.
  *
  * Value-compatible with the HOF formulation by construction: per-lane
  * seed is pre-mixed as `hashLong(seedA(i), 42L)` — exactly what
  * `xxhash64(lit(seedA(i)), h)` folds before mixing `h` — so
  * signatures (and therefore LSH bands and candidate pairs) are
  * bit-identical to the round-2 implementation.
  *
  * Null handling mirrors the HOF form: a null element contributes the
  * pre-mixed seed itself (XxHash64 skips null children), an empty or
  * null input yields null (array_min of empty is null).
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes > 0, s"numHashes must be positive, got $numHashes")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckSuccess
      case other => TypeCheckFailure(
        s"minhash_sig needs array<bigint>; got ${other.sql}")
    }
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  // hashLong(seedA(i), 42L): the state xxhash64(lit(seedA(i)), …)
  // reaches after folding its first (literal) child from seed 42.
  @transient private lazy val seeds: Array[Long] =
    MinHashSig.premixedSeeds(numHashes)

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n == 0) return null
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) {
        var j = 0
        while (j < numHashes) {
          if (seeds(j) < mins(j)) mins(j) = seeds(j); j += 1
        }
      } else {
        val x = a.getLong(i)
        var j = 0
        while (j < numHashes) {
          val h = XXH64.hashLong(x, seeds(j))
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val seedsRef = ctx.addReferenceObj("seeds", seeds, "long[]")
      val n = ctx.freshName("n")
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val x = ctx.freshName("x")
      val h = ctx.freshName("h")
      s"""
         |int $n = $a.numElements();
         |if ($n == 0) { ${ev.isNull} = true; }
         |else {
         |  long[] $mins = new long[$numHashes];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i)) {
         |      for (int $j = 0; $j < $numHashes; $j++) {
         |        if ($seedsRef[$j] < $mins[$j]) $mins[$j] = $seedsRef[$j];
         |      }
         |    } else {
         |      long $x = $a.getLong($i);
         |      for (int $j = 0; $j < $numHashes; $j++) {
         |        long $h = org.apache.spark.sql.catalyst.expressions.XXH64
         |          .hashLong($x, $seedsRef[$j]);
         |        if ($h < $mins[$j]) $mins[$j] = $h;
         |      }
         |    }
         |  }
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {
  /** Golden-ratio odd-multiplier seed family (fixed, no RNG). */
  def seedA(i: Int): Long = 0x9E3779B97F4A7C15L * (2 * i + 1)

  private[functions] def premixedSeeds(numHashes: Int): Array[Long] =
    Array.tabulate(numHashes)(i => XXH64.hashLong(seedA(i), 42L))

  /** DataFrame-API entry: `numHashes`-lane MinHash signature of a
    * hashed-shingle array. */
  def apply(sh: Column, numHashes: Int): Column =
    Shim.column(MinHashSig(Shim.expression(sh), numHashes))
}
