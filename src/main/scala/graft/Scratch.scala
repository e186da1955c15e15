package graft

import graft.functions.VectorExprs
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** TEMP scratch (not committed): inspect the Lloyd means-pass plan. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.aggregate.splitAggregateFunc.enabled", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val v = emb.select(col("vec_id").as("__id"),
      col("embedding").cast("array<double>").as("__v"))
    val dsub = 8
    val books: Seq[Seq[Seq[Double]]] =
      (0 until 8).map(s => (0 until 16).map(j =>
        (0 until dsub).map(d => (s * 16 + j + d) * 0.01)))
    val sCol = (col("__pos") / dsub).cast("int")
    val means = v
      .select(VectorExprs.pqEncode(col("__v"), books).as("__codes"),
        posexplode(col("__v")).as(Seq("__pos", "__x")))
      .filter(col("__codes").isNotNull)
      .select(sCol.as("__s"), element_at(col("__codes"), sCol + 1).as("__c"),
        pmod(col("__pos"), lit(dsub)).cast("int").as("__p"), col("__x"))
      .groupBy(col("__s"), col("__c"), col("__p"))
      .agg((sum(col("__x").cast("decimal(30,12)")) / count(lit(1)))
        .cast("double").as("__m"))
    val txt = means.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    println(txt)
    val n = "graft_pq_encode".r.findAllIn(txt).length
    println(s"PQ_ENCODE_OCCURRENCES=$n")
    // time it
    for (i <- 1 to 3) {
      val t = System.nanoTime()
      means.write.format("noop").mode("overwrite").save()
      println(f"PASS$i ${(System.nanoTime() - t) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
