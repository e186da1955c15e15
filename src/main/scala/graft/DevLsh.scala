package graft

import graft.ops.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the banded-LSH pipeline stages. */
object DevLsh {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // wide aggregates (LSH plane dots, simhash bit-sums) need per-
      // function codegen splitting or they overflow janino's 64 KB limit
      .config("spark.sql.codegen.aggregate.splitAggregateFunc.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    def time[T](label: String)(f: => T): T = {
      val t = System.nanoTime(); val r = f
      println(f"== $label: ${(System.nanoTime() - t) / 1e9}%.2f s"); r
    }
    println("rows = " + emb.count())
    // warm
    time("neardup t=0.4 b=16 p=4 (warm1)")(
      Similarity.cosineNearDupPairs(emb, "vec_id", "embedding",
        0.4, 16, 4).count())
    time("neardup t=0.4 b=16 p=4 (warm2)")(
      println("pairs=" + Similarity.cosineNearDupPairs(emb, "vec_id", "embedding",
        0.4, 16, 4).count()))
    time("neardup t=0.4 b=8 p=4")(
      println("pairs=" + Similarity.cosineNearDupPairs(emb, "vec_id", "embedding",
        0.4, 8, 4).count()))
    time("neardup t=0.4 b=16 p=6")(
      println("pairs=" + Similarity.cosineNearDupPairs(emb, "vec_id", "embedding",
        0.4, 16, 6).count()))
    time("lshTopK b=16 p=3")(
      Similarity.lshTopK(emb, emb.filter(col("vec_id") < 5), "vec_id",
        "embedding", "vec_id", 5, 16, 3).count())
    spark.stop()
  }
}
