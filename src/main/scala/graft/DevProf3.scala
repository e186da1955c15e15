package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-level profile of cosineNearDupPairs at bench shape. */
object DevProf3 {
  private def planeVal(seed: Int, plane: Int, d: Int): Double =
    scala.util.hashing.MurmurHash3.productHash((seed, plane, d))
      .toDouble / Int.MaxValue

  def bandedKeys(df: DataFrame, idName: String, vecName: String,
      bands: Int, planesPerBand: Int, dim: Int, seed: Int): DataFrame = {
    val nPlanes = bands * planesPerBand
    val planeLits = (0 until nPlanes).map(p =>
      typedlit((0 until dim).map(i => planeVal(seed, p, i))))
    val pos = df.select(col(idName),
      posexplode(col(vecName).cast("array<double>")).as(Seq("__p", "__x")))
    val dots = (0 until nPlanes).map(p =>
      sum(col("__x") * element_at(planeLits(p), col("__p") + 1)).as(s"__d$p"))
    val agg = pos.groupBy(idName).agg(dots.head, dots.tail: _*)
    val bandCols = (0 until bands).map { b =>
      val bits = (0 until planesPerBand).map(p =>
        when(col(s"__d${b * planesPerBand + p}") > 0, lit(1L << p))
          .otherwise(lit(0L))).reduce(_ + _)
      struct(lit(b).as("band"), bits.as("bucket"))
    }
    agg.select(col(idName), explode(array(bandCols: _*)).as("lsh"))
      .select(col(idName), col("lsh.band").as("__band"),
        col("lsh.bucket").as("__bucket"))
  }

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
    val emb = spark.read.parquet(s"$d/embeddings.parquet")
    emb.count()
    val twins = emb.filter(col("vec_id") < 50).select(
      (col("vec_id") + 100000).as("vec_id"),
      expr("zip_with(embedding, concat(slice(embedding, 2, 63), " +
        "slice(embedding, 1, 1)), (a, b) -> a + cast(0.25 as float) * b)")
        .as("embedding"))
    val aug = emb.select(col("vec_id"), col("embedding")).unionByName(twins)

    val keys = bandedKeys(aug.select(col("vec_id").as("id"), col("embedding")),
      "id", "embedding", 16, 11, 64, 42)
    spark.conf.set("spark.sql.codegen.maxFields", "500")
    time("keys maxFields=500 warm")(keys.count())
    time("keys maxFields=500 2nd")(keys.count())
    spark.conf.set("spark.sql.codegen.maxFields", "100")
    time("keys warm")(keys.count())
    time("keys 2nd")(keys.count())
    val cand = keys
      .join(keys.select(col("id").as("id_b"), col("__band"), col("__bucket")),
        Seq("__band", "__bucket"))
      .filter(col("id") < col("id_b"))
      .select(col("id").as("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b")
    val n = time("cand warm")(cand.count())
    println(s"candidates = $n")
    time("cand 2nd")(cand.count())
    spark.stop()
  }
}
