package graft

import graft.ops.{Dedup, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Profiling scratch for the two bench regressions:
  * sbt "runMain graft.DevProf2". */
object DevProf2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.aggregate.splitAggregateFunc.enabled", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val d = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val emb = spark.read.parquet(s"$d/embeddings.parquet")
    emb.count(); docs.count() // warm

    // exact bench shape: q_dedup_minhash
    time("minhash warm")(Dedup.minHashLSH(docs, "doc_id", "text",
      3, 64, 16, 0.4).count())
    time("minhash bench-shape")(Dedup.minHashLSH(docs, "doc_id", "text",
      shingleSize = 3, numHashes = 64, bands = 16, threshold = 0.4)
      .withColumn("jaccard", round(col("jaccard"), 4))
      .orderBy("id_a", "id_b").count())

    // exact bench shape: q_embedding_neardup (twins aug, t=0.9, b=16 p=8)
    val twins = emb.filter(col("vec_id") < 50).select(
      (col("vec_id") + 100000).as("vec_id"),
      expr("zip_with(embedding, concat(slice(embedding, 2, 63), " +
        "slice(embedding, 1, 1)), (a, b) -> a + cast(0.25 as float) * b)")
        .as("embedding"))
    val aug = emb.select(col("vec_id"), col("embedding")).unionByName(twins)
    time("neardup warm")(Similarity.cosineNearDupPairs(aug, "vec_id",
      "embedding", 0.9, 16).count())
    time("neardup bench-shape")(Similarity.cosineNearDupPairs(aug, "vec_id",
      "embedding", 0.9, 16).count())

    // q_ann_lsh bench shape
    val q = emb.filter(col("vec_id") < 5)
    time("ann lsh b16 p3")(Similarity.lshTopK(emb, q,
      "vec_id", "embedding", "vec_id", 5, bands = 16, planesPerBand = 3).count())
    spark.stop()
  }
}
