package graft

import graft.ops.KeyProfile
import org.scalatest.funsuite.AnyFunSuite

class KeyProfileSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("hand-checkable histogram: counts, top key, skew, exact entropy") {
    import spark.implicits._
    // a:4 b:2 c:2 over 8 rows — entropy is exactly
    // −(½log½ + ¼log¼ + ¼log¼) = 1.5 bits; skew = 4 / (8/3) = 1.5
    val df = (Seq.fill(4)("a") ++ Seq.fill(2)("b") ++ Seq.fill(2)("c"))
      .toDF("k")
    val r = KeyProfile.keyProfile(df, Seq("k")).collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getAs[String]("column") == "k")
    assert(row.getAs[Long]("n_rows") == 8L)
    assert(row.getAs[Long]("n_distinct") == 3L)
    assert(row.getAs[String]("top_key") == "a")
    assert(row.getAs[Long]("top_count") == 4L)
    assert(row.getAs[Double]("top_share") == 0.5)
    assert(row.getAs[Double]("skew_ratio") == 1.5)
    assert(row.getAs[Double]("entropy_bits") == 1.5)
  }

  test("top-key ties break to the larger key; uniform keys profile flat") {
    import spark.implicits._
    val df = Seq("a", "b", "a", "b").toDF("k")
    val row = KeyProfile.keyProfile(df, Seq("k")).collect()(0)
    assert(row.getAs[String]("top_key") == "b")
    assert(row.getAs[Double]("skew_ratio") == 1.0)
    assert(row.getAs[Double]("entropy_bits") == 1.0)
  }

  test("multiple columns profile independently in one frame") {
    import spark.implicits._
    val df = Seq((1L, "x"), (1L, "y"), (2L, "x")).toDF("id", "s")
    val out = KeyProfile.keyProfile(df, Seq("id", "s"))
      .collect().map(r => r.getAs[String]("column") ->
        (r.getAs[String]("top_key"), r.getAs[Long]("top_count"))).toMap
    assert(out("id") == ("1", 2L))
    assert(out("s") == ("x", 2L))
  }
}
