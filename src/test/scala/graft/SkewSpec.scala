package graft

import graft.ops.Skew
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("property: salted join equals plain join on random zipf-ish data") {
    import spark.implicits._
    val gen = for {
      nl <- Gen.choose(0, 120)
      lrows <- Gen.listOfN(nl, for {
        k <- Gen.frequency(6 -> Gen.const(1L), 2 -> Gen.choose(2L, 4L),
          2 -> Gen.choose(5L, 40L)) // hot key 1, warm 2-4, cold tail
        v <- Gen.choose(0, 999)
      } yield (k, v))
      nr <- Gen.choose(0, 40)
      rrows <- Gen.listOfN(nr, for {
        k <- Gen.choose(1L, 40L); v <- Gen.alphaStr.map(_.take(4))
      } yield (k, v))
      thr <- Gen.choose(1L, 20L)
      salts <- Gen.choose(2, 6)
    } yield (lrows, rrows, thr, salts)
    (1 to 6).foreach { i =>
      val (lrows, rrows, thr, salts) =
        gen(Gen.Parameters.default, Seed(4200L + i)).get
      val left = lrows.toDF("k", "lv")
      val right = rrows.toDF("k", "rv")
      val salted = Skew.skewAwareJoin(left, right, "k", thr, salts)
        .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
      val plain = left.join(right, Seq("k"))
        .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
      assert(salted == plain,
        s"case $i (thr=$thr salts=$salts): salted multiset != plain join")
    }
  }

  test("salted union is row-identical to the plain join under a hot key") {
    import spark.implicits._
    // key 1 is hot (40 rows), keys 2..5 cold (2 each); right has one
    // row per key so expected = left row count
    val left = ((1 to 40).map(i => (1L, s"h$i")) ++
      (2 to 5).flatMap(k => Seq((k.toLong, s"c${k}a"), (k.toLong, s"c${k}b"))))
      .toDF("k", "lv")
    val right = (1 to 5).map(k => (k.toLong, s"r$k")).toDF("k", "rv")
    val salted = Skew.skewAwareJoin(left, right, "k",
        hotThreshold = 10, salts = 4)
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val plain = left.join(right, Seq("k"))
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    assert(salted == plain)
    assert(salted.size == 48)
  }

  test("fan-out right side: every hot pair appears exactly once") {
    import spark.implicits._
    val left = ((1 to 30).map(i => (1L, i)) ++ Seq((2L, 99)))
      .toDF("k", "li")
    val right = Seq((1L, "x"), (1L, "y"), (2L, "z")).toDF("k", "rv")
    val salted = Skew.skewAwareJoin(left, right, "k",
      hotThreshold = 5, salts = 3)
    // hot key 1: 30 left × 2 right = 60, cold key 2: 1 × 1
    assert(salted.count() == 61)
    assert(salted.groupBy("k", "li", "rv").count()
      .filter(col("count") > 1).count() == 0, "a salted pair duplicated")
  }

  test("no hot keys degenerates to the plain join") {
    import spark.implicits._
    val left = (1 to 10).map(i => (i.toLong, i)).toDF("k", "li")
    val right = (1 to 10).map(i => (i.toLong, s"r$i")).toDF("k", "rv")
    val salted = Skew.skewAwareJoin(left, right, "k",
        hotThreshold = 100, salts = 4)
      .collect().map(_.toSeq).toSet
    assert(salted == left.join(right, Seq("k")).collect().map(_.toSeq).toSet)
  }

  test("join cardinality: exact sizing from histograms, verified vs the join") {
    import spark.implicits._
    val left = (Seq.fill(3)(1L) ++ Seq(2L)).map((_, "l")).toDF("k", "lv")
    val right = (Seq.fill(2)(1L) ++ Seq.fill(5)(3L)).map((_, "r")).toDF("k", "rv")
    val row = Skew.joinCardinality(left, right, "k", "k").collect()(0)
    assert(row.getAs[Long]("n_left") == 4L)
    assert(row.getAs[Long]("n_right") == 7L)
    assert(row.getAs[Long]("n_join_keys") == 1L)
    assert(row.getAs[java.math.BigDecimal]("join_rows").longValueExact == 6L)
    assert(row.getAs[String]("top_key") == "1")
    assert(row.getAs[java.math.BigDecimal]("top_key_rows").longValueExact == 6L)
    assert(row.getAs[Double]("top_share") == 1.0)
    // the prediction matches the join it predicts
    assert(left.join(right, Seq("k")).count() == 6L)
  }

  test("join cardinality: empty key intersection reports zero, null top key") {
    import spark.implicits._
    val left = Seq((1L, "l")).toDF("k", "lv")
    val right = Seq((2L, "r")).toDF("k", "rv")
    val row = Skew.joinCardinality(left, right, "k", "k").collect()(0)
    assert(row.getAs[Long]("n_join_keys") == 0L)
    assert(row.getAs[java.math.BigDecimal]("join_rows").longValueExact == 0L)
    assert(row.isNullAt(row.fieldIndex("top_key")))
    assert(row.isNullAt(row.fieldIndex("top_share")))
  }

  test("property: salted LEFT join on a 2-column key equals the plain left join") {
    import spark.implicits._
    val gen = for {
      nl <- Gen.choose(0, 120)
      lrows <- Gen.listOfN(nl, for {
        k1 <- Gen.frequency(6 -> Gen.const(1L), 4 -> Gen.choose(2L, 20L))
        k2 <- Gen.oneOf("a", "b") // composite key: (k1, k2)
        v <- Gen.choose(0, 999)
      } yield (k1, k2, v))
      nr <- Gen.choose(0, 40)
      rrows <- Gen.listOfN(nr, for {
        k1 <- Gen.choose(1L, 20L); k2 <- Gen.oneOf("a", "b", "c")
        v <- Gen.alphaStr.map(_.take(4))
      } yield (k1, k2, v))
      thr <- Gen.choose(1L, 20L)
      salts <- Gen.choose(2, 6)
    } yield (lrows, rrows, thr, salts)
    (1 to 6).foreach { i =>
      val (lrows, rrows, thr, salts) =
        gen(Gen.Parameters.default, Seed(9300L + i)).get
      val left = lrows.toDF("k1", "k2", "lv")
      val right = rrows.toDF("k1", "k2", "rv")
      val salted = Skew.skewAwareJoin(left, right, Seq("k1", "k2"), thr,
          salts, joinType = "left")
        .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
      val plain = left.join(right, Seq("k1", "k2"), "left")
        .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
      assert(salted == plain,
        s"case $i (thr=$thr salts=$salts): salted left-join multiset != plain")
    }
  }

  test("left join: unmatched and null-keyed hot lefts null-fill exactly once") {
    import spark.implicits._
    // key 1 hot with NO right match; key 2 hot WITH matches; one
    // null-keyed left row (never semi-matches the hot set)
    val left = ((1 to 30).map(i => (java.lang.Long.valueOf(1L), s"a$i")) ++
      (1 to 25).map(i => (java.lang.Long.valueOf(2L), s"b$i")) ++
      Seq((null.asInstanceOf[java.lang.Long], "n1"), (java.lang.Long.valueOf(3L), "c1")))
      .toDF("k", "lv")
    val right = Seq((2L, "x"), (2L, "y"), (3L, "z")).toDF("k", "rv")
    val salted = Skew.skewAwareJoin(left, right, Seq("k"),
        hotThreshold = 10, salts = 4, joinType = "left")
      .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    val plain = left.join(right, Seq("k"), "left")
      .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    assert(salted == plain)
    // 30 unmatched hot + 25*2 matched hot + 1 null + 1 cold = 82
    assert(salted.values.sum == 82)
  }

  test("property: salted RIGHT and FULL joins on a 2-column key equal the plain joins") {
    import spark.implicits._
    val gen = for {
      nl <- Gen.choose(0, 120)
      lrows <- Gen.listOfN(nl, for {
        k1 <- Gen.frequency(6 -> Gen.const(1L), 4 -> Gen.choose(2L, 20L))
        k2 <- Gen.oneOf("a", "b")
        v <- Gen.choose(0, 999)
      } yield (k1, k2, v))
      nr <- Gen.choose(0, 40)
      rrows <- Gen.listOfN(nr, for {
        k1 <- Gen.choose(1L, 20L); k2 <- Gen.oneOf("a", "b", "c")
        v <- Gen.alphaStr.map(_.take(4))
      } yield (k1, k2, v))
      thr <- Gen.choose(1L, 20L)
      salts <- Gen.choose(2, 6)
    } yield (lrows, rrows, thr, salts)
    for (jt <- Seq("right", "full"); i <- 1 to 4) {
      val (lrows, rrows, thr, salts) =
        gen(Gen.Parameters.default, Seed(7700L + i)).get
      val left = lrows.toDF("k1", "k2", "lv")
      val right = rrows.toDF("k1", "k2", "rv")
      val salted = Skew.skewAwareJoin(left, right, Seq("k1", "k2"), thr,
          salts, joinType = jt)
        .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
      val plain = left.join(right, Seq("k1", "k2"), jt)
        .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
      assert(salted == plain,
        s"$jt case $i (thr=$thr salts=$salts): salted multiset != plain")
    }
  }

  test("right/full: hot-key right rows never null-fill, unmatched rights once") {
    import spark.implicits._
    // key 1 hot with right matches; key 9 right-only (unmatched); a
    // null-keyed right row; key 2 hot with NO right rows (full must
    // null-fill its lefts, right must drop them)
    val left = ((1 to 30).map(i => (java.lang.Long.valueOf(1L), s"a$i")) ++
      (1 to 20).map(i => (java.lang.Long.valueOf(2L), s"b$i")) ++
      Seq((java.lang.Long.valueOf(3L), "c1")))
      .toDF("k", "lv")
    val right = Seq((java.lang.Long.valueOf(1L), "x"),
      (java.lang.Long.valueOf(1L), "y"), (java.lang.Long.valueOf(3L), "z"),
      (java.lang.Long.valueOf(9L), "u"),
      (null.asInstanceOf[java.lang.Long], "n")).toDF("k", "rv")
    for (jt <- Seq("right", "full")) {
      val salted = Skew.skewAwareJoin(left, right, Seq("k"),
          hotThreshold = 10, salts = 4, joinType = jt)
        .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
      val plain = left.join(right, Seq("k"), jt)
        .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
      assert(salted == plain, s"$jt: salted multiset != plain")
    }
  }

  test("unsupported join types raise") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      Skew.skewAwareJoin(df, df.select(col("k"), col("v").as("w")),
        Seq("k"), 10, 4, joinType = "left_semi")
    }
    assert(e.getMessage.contains("inner, left, right and full"))
  }

  test("hot path widens the shuffle key with the salt") {
    import spark.implicits._
    val left = (1 to 100).map(i => (1L, i)).toDF("k", "li")
    val right = Seq((1L, "x")).toDF("k", "rv")
    val df = Skew.skewAwareJoin(left, right, "k",
      hotThreshold = 10, salts = 8)
    df.collect()
    // the executed plan must hash-partition some exchange on __salt —
    // that spreading IS the operator's contract
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("__salt"),
      s"no salted exchange in plan:\n${plan.take(3000)}")
  }
}
