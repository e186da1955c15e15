package graft

import graft.gen.Generator
import graft.plan.SemanticQuery
import graft.sqlfront.GraftExtensions
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions surface: semantic models usable from plain
  * spark.sql(...) on a session built with GraftExtensions. */
class ExtensionsSpec extends AnyFunSuite {

  private def withExtendedSession[T](f: SparkSession => T): T = {
    val base = TestSpark.spark // ensures a SparkContext exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try f(s)
    finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }

  test("semantic models resolve inside plain spark.sql") {
    withExtendedSession { s =>
      val cat = TpchCatalog.build(TestSpark.sfDir)
      GraftExtensions.register(s, cat)
      val viaSql = s.sql(
        "SELECT orders.orderstatus, orders.revenue FROM orders ORDER BY orderstatus")
        .collect().map(_.toSeq).toSeq
      val viaApi = new Generator(s, cat).plan(SemanticQuery(
        metrics = Seq("orders.revenue"),
        dimensions = Seq("orders.orderstatus"),
        orderBy = Seq("orderstatus"))).collect().map(_.toSeq).toSeq
      assert(viaSql == viaApi)
    }
  }

  test("cross-model semantic SQL joins through the graph") {
    withExtendedSession { s =>
      GraftExtensions.register(s, TpchCatalog.build(TestSpark.sfDir))
      val df = s.sql(
        "SELECT region.name, orders.revenue FROM orders ORDER BY name")
      assert(df.columns.toSeq == Seq("name", "revenue"))
      assert(df.count() == 5)
    }
  }

  test("non-semantic SQL on the extended session is untouched") {
    withExtendedSession { s =>
      GraftExtensions.register(s, TpchCatalog.build(TestSpark.sfDir))
      s.read.parquet(s"${TestSpark.sfDir}/region.parquet")
        .createOrReplaceTempView("plain_region")
      assert(s.sql("SELECT count(*) FROM plain_region").collect()(0).getLong(0) == 5)
    }
  }

  test("kernel functions are callable from SQL on the extended session") {
    withExtendedSession { s =>
      val r = s.sql(
        "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d, " +
          "graft_l2norm(array(3.0d, 4.0d)) AS n, " +
          "graft_simhash(array('a', 'b', 'c')) AS sh, " +
          "size(graft_minhash_sigs(" +
          "  graft_shingle_hashes(array('a','b','c','a','b'), 3), 8)) AS k, " +
          "graft_bit_agreement(array(0L), array(0L), 64) AS agree")
        .collect()(0)
      assert(r.getDouble(0) == 11.0)
      assert(r.getDouble(1) == 5.0)
      assert(!r.isNullAt(2))
      assert(r.getInt(3) == 8)
      assert(r.getLong(4) == 64L)
      // SQL values must equal the Column-API kernels they alias
      import org.apache.spark.sql.functions.{array, lit, split}
      val viaApi = s.range(1).select(
        graft.functions.VectorExprs.dot(
          array(lit(1.0), lit(2.0)), array(lit(3.0), lit(4.0))).as("d"),
        graft.functions.DedupExprs.simHash64(
          split(lit("a b c"), " ")).as("sh")).collect()(0)
      assert(viaApi.getDouble(0) == r.getDouble(0))
      assert(viaApi.getLong(1) == r.getLong(2))
    }
  }

  test("WARC and positional-shingle kernels are callable from SQL") {
    withExtendedSession { s =>
      val r = s.sql(
        "SELECT size(graft_positional_shingle_hashes(" +
          "  array('a','b','c','a','b','c'), 3)) AS np, " +
          "graft_gunzip_text(graft_gzip_bytes('round trip')) AS rt, " +
          "size(graft_warc_records(graft_gunzip_text(graft_gzip_bytes(" +
          "  'WARC/1.0\r\nWARC-Type: metadata\r\nContent-Length: 2" +
          "\r\n\r\nok\r\n\r\n')))) AS nr")
        .collect()(0)
      assert(r.getInt(0) == 4)  // one hash per start position
      assert(r.getString(1) == "round trip")
      assert(r.getInt(2) == 1)  // one parsed record
    }
  }

  test("structural kernel args must be integer literals") {
    withExtendedSession { s =>
      val e = intercept[Exception] {
        s.sql("SELECT graft_shingle_hashes(array('a'), 1 + cast(rand() as int))")
          .collect()
      }
      assert(e.getMessage.contains("integer literal"),
        s"unexpected error: ${e.getMessage}")
    }
  }
}
