package graft
import org.apache.spark.sql.SparkSession

/** One-off: print the executed plan of a SparkEntry query for plan-diffing
  * across commits (not part of the library surface). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir) = args
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.aggregate.splitAggregateFunc.enabled", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect() // let AQE finalize the real plan
    println("=== PLAN START")
    println(df.queryExecution.executedPlan.toString)
    println("=== PLAN END")
  }
}
