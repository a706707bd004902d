package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Config-time registration of the engine's SQL surface:
  * `spark.sql.extensions=graft.functions.GraftExtensions` injects every
  * `graft_*` function (from the shared [[functions.sqlFunctionBuilders]]
  * table) plus the engine's optimizer rules at session build — the
  * standard Catalyst-extension deployment path. For sessions that already
  * exist, [[functions.registerSql]] registers the same table imperatively.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.JaccardLengthFilter)
    sqlFunctionBuilders.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.expressions", name),
        builder))
    }
  }
}
