package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Explicit hot-key salting for shuffle joins — the manual escape hatch
  * for skew AQE can't reach (AQE splits oversized shuffle REDUCE
  * partitions of sort-merge joins, but not a hot build side that must
  * co-locate, not shuffle-hash joins it didn't pick, and nothing when a
  * downstream stage pins the partitioning). [[KeyProfile.keyProfile]]
  * is the diagnostic that says whether you need this and what
  * `hotThreshold` should be.
  *
  * The classic split-join: keys whose left-side row count exceeds
  * `hotThreshold` take the salted path — each hot LEFT row gets one of
  * `salts` deterministic salt values, the matching RIGHT rows are
  * replicated once per salt, and the join key widens to (key, salt) so
  * one hot key spreads over `salts` shuffle partitions. Cold keys join
  * plainly. The union of the two paths is ROW-IDENTICAL to the plain
  * join — salting only changes physical placement.
  *
  * Cost model: the hot-key histogram is one aggregate over the left
  * keys; the hot-key set is broadcast (it is small by definition — a
  * key is only hot when it repeats beyond `hotThreshold`, so there can
  * be at most n/hotThreshold of them); replication cost is salts ×
  * (right rows under hot keys), which is exactly the data that was
  * causing the straggler. Catalyst's exchange reuse executes the
  * histogram subtree once even though both split sides reference it.
  *
  * Inner equi-join on one key column (callers with composite keys
  * pre-concatenate; left/right column names must be disjoint apart
  * from the key, same as a plain `join(right, Seq(key))`). The salt is
  * `pmod` over a per-row monotonic id — layout-dependent, which is
  * admissible here because the RESULT is salt-invariant (any spreading
  * of a hot key's rows is correct); only physical placement varies.
  */
object Skew {

  def skewAwareJoin(left: DataFrame, right: DataFrame, key: String,
      hotThreshold: Long, salts: Int = 8): DataFrame = {
    require(salts > 1, s"salts must be > 1, got $salts")
    require(hotThreshold > 0, s"hotThreshold must be positive")
    val hot = left.groupBy(col(key)).agg(count(lit(1)).as("__hc"))
      .filter(col("__hc") > hotThreshold)
      .select(col(key))
    val leftHot = left.join(broadcast(hot), Seq(key), "left_semi")
      .withColumn("__salt",
        pmod(monotonically_increasing_id(), lit(salts.toLong)))
    val rightHot = right.join(broadcast(hot), Seq(key), "left_semi")
      .withColumn("__salt",
        explode(array((0 until salts).map(s => lit(s.toLong)): _*)))
    val hotJoined = leftHot.join(rightHot,
        leftHot(key) === rightHot(key) && leftHot("__salt") === rightHot("__salt"))
      .drop(rightHot(key)).drop(leftHot("__salt")).drop(rightHot("__salt"))
    val coldJoined = left.join(broadcast(hot), Seq(key), "left_anti")
      .join(right, Seq(key))
    coldJoined.unionByName(hotJoined.select(coldJoined.columns.map(col): _*))
  }
}
