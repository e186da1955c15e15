package graft

import graft.ops.{Dedup, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Profiling scratch: sbt "runMain graft.DevProf". */
object DevProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // wide aggregates (LSH plane dots, simhash bit-sums) need per-
      // function codegen splitting or they overflow janino's 64 KB limit
      .config("spark.sql.codegen.aggregate.splitAggregateFunc.enabled", "true")
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
    emb.count(); docs.count() // warm file listing

    time("minhash full")(Dedup.minHashLSH(docs, "doc_id", "text",
      3, 64, 16, 0.4).count())
    time("minhash 2nd")(Dedup.minHashLSH(docs, "doc_id", "text",
      3, 64, 16, 0.4).count())
    time("minhash h32")(Dedup.minHashLSH(docs, "doc_id", "text",
      3, 32, 8, 0.4).count())
    time("simhash full")(Dedup.simHashPairs(docs, "doc_id", "text", 3).count())

    val q = emb.filter(col("vec_id") < 5)
    time("ann brute")(Similarity.bruteForceTopK(emb, q,
      "vec_id", "embedding", "vec_id", 5).count())
    time("ann lsh 1st")(Similarity.lshTopK(emb, q,
      "vec_id", "embedding", "vec_id", 5, bands = 16, planesPerBand = 3).count())
    time("ann lsh 2nd")(Similarity.lshTopK(emb, q,
      "vec_id", "embedding", "vec_id", 5, bands = 16, planesPerBand = 3).count())
    time("neardup")(Similarity.cosineNearDupPairs(emb, "vec_id", "embedding",
      0.4, 16, 4).count())
    spark.stop()
  }
}
