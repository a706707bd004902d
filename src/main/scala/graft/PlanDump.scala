package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{ExtendedMode, FormattedMode}

/** Plan-audit utility: print the extended (or formatted) explain of any
  * registry query without running it —
  * `runMain graft.PlanDump <query> [sfDir] [formatted]`. The per-operator
  * review loop this supports: confirm PushedFilters/ReadSchema reach the
  * scan, WholeStageCodegen spans stay wide, and no operator re-plans into
  * something that would not survive a 100× scale-up.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, s"usage: PlanDump <query> [sfDir] [formatted]; " +
      s"queries: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val mode = if (args.length > 2 && args(2) == "formatted") FormattedMode else ExtendedMode
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.debug.maxToStringFields", "2000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.plans.JaccardLengthFilter
    val df = SparkEntry.queries(name)(spark, sfDir)
    println(df.queryExecution.explainString(mode))
    spark.stop()
  }
}
