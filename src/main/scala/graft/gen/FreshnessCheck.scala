package graft.gen

import graft.model._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Freshness evaluation (reference: core/freshness.py + the `freshness`
  * checks in cli.py): each model/explore may declare a [[Freshness]]
  * policy; evaluation probes MAX(watermark) (or the advanced `sql`
  * scalar) and compares its age against `ttl_seconds`.
  *
  * Scale notes: the watermark probe is `SELECT MAX(col)` over the model's
  * scan — column-pruned to one column at the file source and aggregated
  * with a map-side partial MAX, so it reads one column's pages and moves
  * 1 row per partition regardless of table size. Probes for different
  * models are independent Spark jobs; [[checkAll]] builds ONE union plan
  * so a battery of N models is a single action, not N sequential jobs. */
object FreshnessCheck {

  /** One model's freshness verdict. `fresh` is None when the policy has
    * no ttl (probe-only) or the source is empty (no watermark). */
  final case class Result(
      name: String,
      watermark: Option[java.sql.Timestamp],
      ageSeconds: Option[Long],
      ttlSeconds: Option[Long],
      fresh: Option[Boolean])

  /** The probe frame for one model: one row
    * `(name, watermark timestamp)`. Watermark resolves through the
    * model's dimensions (a time dimension's `sql` wins over its name) so
    * policies can name semantic fields, not just physical columns. */
  def probe(spark: SparkSession, cat: Catalog, m: Model): Option[DataFrame] =
    m.freshness.flatMap { f =>
      f.sql.map { s =>
        val df = spark.sql(s)
        df.select(lit(m.name).as("name"),
          col(df.columns.head).cast("timestamp").as("watermark"))
      }
        .orElse(f.watermark.map { w =>
          val expr0 = m.dimension(w).flatMap(_.sql).getOrElse(w)
          cat.scan(spark, m).agg(
            max(expr(expr0)).cast("timestamp").as("watermark"))
            .select(lit(m.name).as("name"), col("watermark"))
        })
    }

  /** Evaluate one model's policy against `asOf` (caller-supplied so runs
    * are reproducible; pass `Timestamp.from(Instant.now)` for wall-clock
    * checks). */
  def check(spark: SparkSession, cat: Catalog, modelName: String,
      asOf: java.sql.Timestamp): Result = {
    val m = cat.model(modelName)
    val f = m.freshness.getOrElse(throw new IllegalArgumentException(
      s"Model '$modelName' declares no freshness policy"))
    val wm = probe(spark, cat, m).flatMap(df =>
      Option(df.collect()(0).getTimestamp(1)))
    val age = wm.map(w => (asOf.getTime - w.getTime) / 1000L)
    Result(m.name, wm, age, f.ttlSeconds,
      for (a <- age; t <- f.ttlSeconds) yield a <= t)
  }

  /** All declared policies as ONE DataFrame
    * `(name, watermark, age_seconds, ttl_seconds, is_fresh)` — a single
    * union plan / single action for the whole catalog. Models without a
    * policy are absent (they have no freshness contract to report). */
  def checkAll(spark: SparkSession, cat: Catalog,
      asOf: java.sql.Timestamp): DataFrame = {
    val probes = cat.models.values.toSeq.sortBy(_.name).flatMap { m =>
      probe(spark, cat, m).map(df => df.select(
        col("name"),
        col("watermark"),
        ((lit(asOf).cast("long")) - col("watermark").cast("long"))
          .as("age_seconds"),
        m.freshness.flatMap(_.ttlSeconds) match {
          case Some(t) => lit(t).as("ttl_seconds")
          case None    => lit(null).cast("long").as("ttl_seconds")
        }))
    }
    require(probes.nonEmpty, "No model in the catalog declares freshness")
    probes.reduce(_ unionAll _)
      .withColumn("is_fresh", col("age_seconds") <= col("ttl_seconds"))
  }
}
