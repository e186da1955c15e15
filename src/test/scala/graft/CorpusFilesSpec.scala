package graft

import graft.ops.CorpusFiles
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Corpus small-file compaction ([[CorpusFiles.compactBySize]]): content
  * preservation, size-targeted output counts, the sorted range layout's
  * per-file key disjointness, and crash-window recovery. */
class CorpusFilesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def freshCorpus(nAppends: Int): String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_cfiles").toString
    val dir = s"$tmp/docs"
    val base = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
      .select("doc_id", "text")
    base.repartition(4).write.mode("overwrite").parquet(dir)
    (0 until nAppends).foreach(i =>
      base.filter(col("doc_id") % 50 === i).repartition(1)
        .write.mode("append").parquet(dir))
    dir
  }

  test("compaction preserves every row and reduces the file count") {
    val dir = freshCorpus(nAppends = 6)
    val before = spark.read.parquet(dir).collect()
      .map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    val receipt = CorpusFiles.compactBySize(spark, dir, 64L << 20).collect()(0)
    assert(receipt.getAs[Long]("files_before") === 10) // 4 base + 6 appends
    assert(receipt.getAs[Long]("files_after") === 1)   // tiny corpus, 64 MB target
    assert(receipt.getAs[Long]("rows") === before.values.sum)
    val after = spark.read.parquet(dir).collect()
      .map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    assert(after === before, "compaction changed corpus content")
  }

  test("smaller targets yield proportionally more, still-balanced files") {
    val dir = freshCorpus(nAppends = 4)
    val bytes = graft.ops.IndexFiles.parquetBytes(spark, dir)
    val target = bytes / 3
    val receipt = CorpusFiles.compactBySize(spark, dir, target).collect()(0)
    // ceil(bytes / (bytes/3)) is 3 or 4 depending on the integer division
    val expected = (bytes + target - 1) / target
    assert(receipt.getAs[Long]("files_after") === expected)
    // round-robin balance: no output file holds more than ~2x its share
    val perFile = spark.read.parquet(dir)
      .groupBy(input_file_name()).count().collect().map(_.getLong(1))
    assert(perFile.length === expected)
    val share = perFile.sum.toDouble / perFile.length
    assert(perFile.max <= share * 2,
      s"unbalanced output: ${perFile.mkString(",")}")
  }

  test("sorted compaction gives files disjoint doc_id ranges (stat pruning)") {
    val dir = freshCorpus(nAppends = 6)
    val bytes = graft.ops.IndexFiles.parquetBytes(spark, dir)
    CorpusFiles.compactBySize(spark, dir, bytes / 4 + 1, Seq("doc_id"))
    val ranges = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min("doc_id").as("lo"), max("doc_id").as("hi"))
      .collect().map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi")))
      .sortBy(_._1)
    assert(ranges.length > 1, "need multiple files to check disjointness")
    ranges.sliding(2).foreach { case Array((_, hi1), (lo2, _)) =>
      assert(hi1 <= lo2, s"overlapping file ranges: ${ranges.mkString(" ")}")
    }
  }

  test("recover heals the swap's no-live-directory window") {
    val dir = freshCorpus(nAppends = 2)
    val before = spark.read.parquet(dir).count()
    assert(CorpusFiles.recover(spark, dir) === "ok")
    val conf = spark.sparkContext.hadoopConfiguration
    val live = new org.apache.hadoop.fs.Path(dir)
    val fs = live.getFileSystem(conf)
    org.apache.hadoop.fs.FileUtil.copy(fs, live, fs,
      new org.apache.hadoop.fs.Path(s"$dir.compact"), false, conf)
    assert(fs.rename(live, new org.apache.hadoop.fs.Path(s"$dir.old")))
    assert(CorpusFiles.recover(spark, dir) === "recovered_compact")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir.old")))
    spark.catalog.refreshByPath(dir)
    assert(spark.read.parquet(dir).count() === before)
  }

  test("invalid targets and roots are rejected loudly") {
    intercept[IllegalArgumentException](
      CorpusFiles.compactBySize(spark, "/tmp/whatever", 0))
    intercept[IllegalArgumentException](
      CorpusFiles.compactBySize(spark, "/", 1024))
  }
}
