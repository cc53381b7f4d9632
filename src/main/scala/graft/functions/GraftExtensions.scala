package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions registration for the engine's native
  * functions, so SQL users get them too:
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  *   ...
  * spark.sql("SELECT graft_stem(name) FROM products")
  * }}}
  *
  * [[install]] registers the same functions on an already-running
  * session (the driver contract hands us one, so the config-based
  * route isn't always available).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectFunction(GraftExtensions.stemDescriptor)
}

object GraftExtensions {

  private val stemDescriptor = (
    FunctionIdentifier("graft_stem"),
    new ExpressionInfo(classOf[StemText].getName, "graft_stem"),
    (children: Seq[Expression]) => StemText(children.head))

  /** Register the engine functions on an existing session. */
  def install(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_stem", exprs => StemText(exprs.head), "scala_udf")
}
