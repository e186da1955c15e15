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

  private def freshBucketed(): String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_cparts").toString
    val dir = s"$tmp/docs"
    val base = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
      .select("doc_id", "text")
      .withColumn("bucket", pmod(col("doc_id"), lit(4)))
    base.repartition(col("bucket")).write.mode("overwrite")
      .partitionBy("bucket").parquet(dir)
    // fragment buckets 0 and 1 only (slices congruent with the bucket)
    for (b <- 0 to 1; k <- 0 to 2)
      base.filter(pmod(col("doc_id"), lit(100)) === (b + 4 * k))
        .repartition(1).write.mode("append").partitionBy("bucket").parquet(dir)
    dir
  }

  private def filesIn(dir: String): Map[String, Set[String]] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).filter(_.isDirectory).map { st =>
      st.getPath.getName -> fs.listStatus(st.getPath)
        .map(_.getPath.getName).filter(_.endsWith(".parquet")).toSet
    }.toMap
  }

  test("partition-scoped compaction rewrites only the fragmented partitions") {
    val dir = freshBucketed()
    val before = filesIn(dir)
    assert(before("bucket=0").size === 4 && before("bucket=1").size === 4)
    assert(before("bucket=2").size === 1 && before("bucket=3").size === 1)
    val rowsBefore = spark.read.parquet(dir).collect()
      .map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    val receipts = CorpusFiles
      .compactPartitionsBySize(spark, dir, 64L << 20).orderBy("partition")
      .collect()
    assert(receipts.map(_.getString(0)).toSeq === Seq("bucket=0", "bucket=1"))
    receipts.foreach { r =>
      assert(r.getAs[Long]("files_before") === 4)
      assert(r.getAs[Long]("files_after") === 1)
    }
    val after = filesIn(dir)
    // cold partitions keep their exact file sets — never read, never written
    assert(after("bucket=2") === before("bucket=2"))
    assert(after("bucket=3") === before("bucket=3"))
    assert(after("bucket=0").size === 1 && after("bucket=1").size === 1)
    spark.catalog.refreshByPath(dir)
    val rowsAfter = spark.read.parquet(dir).collect()
      .map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    assert(rowsAfter === rowsBefore, "partition compaction changed content")
  }

  test("maxPartitions bounds the blast radius; healthy recover is a no-op") {
    val dir = freshBucketed()
    val receipts = CorpusFiles
      .compactPartitionsBySize(spark, dir, 64L << 20, maxPartitions = 1)
      .collect()
    assert(receipts.map(_.getString(0)).toSeq === Seq("bucket=0"))
    assert(filesIn(dir)("bucket=1").size === 4, "bucket=1 must be untouched")
    assert(CorpusFiles.recoverPartitions(spark, dir).collect().isEmpty)
  }

  test("partitionProfile reads only the listing and flags fragmentation") {
    val dir = freshBucketed()
    val rows = CorpusFiles.partitionProfile(spark, dir).orderBy("partition")
      .collect()
    assert(rows.map(_.getString(0)).toSeq ===
      Seq("bucket=0", "bucket=1", "bucket=2", "bucket=3"))
    rows.foreach { r =>
      val hot = r.getString(0) < "bucket=2"
      assert(r.getAs[Long]("files") === (if (hot) 4L else 1L))
      assert(r.getAs[Boolean]("fragmented") === hot)
      assert(r.getAs[Long]("bytes") > 0)
      assert(r.getAs[Long]("min_file_bytes") <= r.getAs[Long]("max_file_bytes"))
      assert(r.getAs[Long]("bytes") >= r.getAs[Long]("max_file_bytes"))
    }
  }

  test("recoverPartitions heals an interrupted partition swap") {
    val dir = freshBucketed()
    val conf = spark.sparkContext.hadoopConfiguration
    val live = new org.apache.hadoop.fs.Path(s"$dir/bucket=1")
    val fs = live.getFileSystem(conf)
    val rowsBefore = spark.read.parquet(dir).count()
    org.apache.hadoop.fs.FileUtil.copy(fs, live, fs,
      new org.apache.hadoop.fs.Path(s"$dir/bucket=1.compact"), false, conf)
    assert(fs.rename(live, new org.apache.hadoop.fs.Path(s"$dir/bucket=1.old")))
    val healed = CorpusFiles.recoverPartitions(spark, dir).collect()
    assert(healed.map(r => (r.getString(0), r.getString(1))).toSeq ===
      Seq(("bucket=1", "recovered_compact")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/bucket=1.old")))
    spark.catalog.refreshByPath(dir)
    assert(spark.read.parquet(dir).count() === rowsBefore)
  }

  test("maintain: heal -> profile -> compact fragmented only -> receipt, " +
      "idempotent on a settled table") {
    val dir = freshBucketed()
    // plant an interrupted swap so the healing pass has work
    val conf = spark.sparkContext.hadoopConfiguration
    val live = new org.apache.hadoop.fs.Path(s"$dir/bucket=0")
    val fs = live.getFileSystem(conf)
    org.apache.hadoop.fs.FileUtil.copy(fs, live, fs,
      new org.apache.hadoop.fs.Path(s"$dir/bucket=0.compact"), false, conf)
    assert(fs.rename(live, new org.apache.hadoop.fs.Path(s"$dir/bucket=0.old")))
    val rows = CorpusFiles.maintain(spark, dir, 64L << 20).collect()
    assert(rows.map(_.getString(0)).toSeq ===
      Seq("bucket=0", "bucket=1", "bucket=2", "bucket=3"))
    rows.foreach { r =>
      val frag = r.getAs[Boolean]("was_fragmented")
      assert(r.getAs[Boolean]("compacted") === frag, r.toString)
      assert(r.getAs[Long]("files_after") === 1L, r.toString)
      assert(!r.getAs[Boolean]("still_fragmented"), r.toString)
      if (!frag) assert(r.getAs[Long]("files_before") === 1L, r.toString)
    }
    // second run: nothing fragmented, nothing rewritten
    val files1 = filesIn(dir)
    val again = CorpusFiles.maintain(spark, dir, 64L << 20).collect()
    assert(again.forall(r => !r.getAs[Boolean]("compacted")))
    assert(filesIn(dir) === files1, "a settled table was rewritten")
  }

  test("invalid targets and roots are rejected loudly") {
    intercept[IllegalArgumentException](
      CorpusFiles.compactBySize(spark, "/tmp/whatever", 0))
    intercept[IllegalArgumentException](
      CorpusFiles.compactBySize(spark, "/", 1024))
  }
}
