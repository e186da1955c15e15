package graft

import graft.ops.Sketches
import org.scalatest.funsuite.AnyFunSuite

class SketchesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("sharded union lands near-exact at small cardinality; dups ignored") {
    import spark.implicits._
    // 1000 distinct keys, each duplicated 3x — duplicates must not
    // inflate the estimate, and sparse mode holds it within ~1%
    val df = (1 to 1000).flatMap(i => Seq.fill(3)(s"key$i")).toDF("k")
    val row = Sketches.shardedDistinct(df, "k").collect()(0)
    val est = row.getAs[Long]("approx_distinct")
    assert(math.abs(est - 1000L) <= 10L, s"estimate $est")
    assert(row.getAs[Long]("n_shards") == 32L)
  }

  test("estimate is partition-layout invariant for a fixed shard cut") {
    import spark.implicits._
    val df = (1 to 2000).map(i => s"v$i").toDF("k")
    val a = Sketches.shardedDistinct(df, "k", nShards = 32)
      .collect()(0).getAs[Long]("approx_distinct")
    val b = Sketches.shardedDistinct(df.repartition(7), "k", nShards = 32)
      .collect()(0).getAs[Long]("approx_distinct")
    // register merging is max-based: physical layout cannot move the
    // estimate (a different nShards CAN — promotion points shift —
    // which is why results pin the shard count)
    assert(a == b)
    assert(math.abs(a - 2000L) <= 40L, s"estimate $a")
  }

  test("dense mode stays inside the published error envelope") {
    import spark.implicits._
    val n = 50000
    val df = (1 to n).map(i => s"dense$i").toDF("k")
    val est = Sketches.shardedDistinct(df, "k")
      .collect()(0).getAs[Long]("approx_distinct")
    // RSE ≈ 1.04/√4096 ≈ 1.6%; 5% is > 3σ
    assert(math.abs(est - n).toDouble / n < 0.05,
      s"estimate $est for $n distincts")
  }
}
