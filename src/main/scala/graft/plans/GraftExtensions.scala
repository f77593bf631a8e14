package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{ArrayMaxLE, CosineSim, DotProduct}

/** SparkSessionExtensions entry point: registers graft's custom
  * Catalyst expressions as SQL functions, so any session built with
  *
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions)
  * }}}
  *
  * (or `--conf spark.sql.extensions=graft.plans.GraftExtensions` on a
  * cluster) can call them from plain SQL:
  *
  * {{{
  *   SELECT array_max_le(sorted_ts_array, o_orderdate)   -- as-of probe
  *   SELECT cosine_sim(a.embedding, b.embedding)          -- fused cosine
  * }}}
  *
  * The DataFrame API paths ([[graft.functions.ArrayMaxLE.apply]],
  * [[graft.functions.CosineSim.apply]]) plan the same expressions
  * without needing the extension, so the declared queries stay pure
  * functions of any driver-provided session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("array_max_le"),
      new ExpressionInfo(classOf[ArrayMaxLE].getName, "array_max_le"),
      (children: Seq[Expression]) => ArrayMaxLE(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (children: Seq[Expression]) => CosineSim(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    // optimizer pass: fuse the HOF sum-of-squares pattern into the
    // codegen DotProduct kernel (see FuseDotProduct)
    ext.injectOptimizerRule(_ => FuseDotProduct)
  }
}
