package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extension point (SparkSessionExtensions): registers the native
  * expressions as SQL functions. Enable with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")` or
  * imperatively via `GraftExtensions.register(spark)` on an existing
  * session (used by the query layer so the driver's own sessions work).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.quantizedDotDescriptor)
  }
}

object GraftExtensions {
  private val quantizedDotDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("quantized_dot"),
    new ExpressionInfo(classOf[QuantizedDot].getName, "quantized_dot"),
    (children: Seq[Expression]) => QuantizedDot(children(0), children(1)))

  /** Idempotent imperative registration for sessions built without the
    * extensions config. */
  def register(spark: SparkSession): Unit = {
    val (id, info, builder) = quantizedDotDescriptor
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(id))
      registry.registerFunction(id, info, builder)
  }
}
