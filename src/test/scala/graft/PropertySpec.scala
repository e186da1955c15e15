package graft

import graft.gen.Generator
import graft.graph.SemanticGraph
import graft.model._
import graft.model.ModelSource.Table
import graft.plan.SemanticQuery
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-style tests (SURVEY §5 — an upgrade the reference lacks):
  * randomized datasets, deterministic seeds, invariants checked against
  * independently-computed SQL answers. Each Spark round trip is costly, so
  * cases are sampled from ScalaCheck generators under fixed seeds rather
  * than run through forAll's default 100 iterations.
  */
class PropertySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private case class World(customers: Seq[(Int, String, Int)],
      orders: Seq[(Int, Int, String)])

  private val worldGen: Gen[World] = for {
    nCust <- Gen.choose(5, 30)
    custs <- Gen.sequence[Seq[(Int, String, Int)], (Int, String, Int)](
      (1 to nCust).map(i => for {
        country <- Gen.oneOf("US", "UK", "DE", "FR")
        limit <- Gen.choose(100, 5000)
      } yield (i, country, limit)))
    nOrd <- Gen.choose(0, 80)
    ords <- Gen.sequence[Seq[(Int, Int, String)], (Int, Int, String)](
      (1 to nOrd).map(i => for {
        cust <- Gen.choose(1, nCust)
        status <- Gen.oneOf("paid", "pending", "refunded")
      } yield (i, cust, status)))
  } yield World(custs, ords)

  private def sample(seed: Long): World =
    worldGen.apply(Gen.Parameters.default, Seed(seed)).get

  private def catalogFor(tag: String): Catalog = Catalog()
    .add(
      Model("pcust", Table(s"p_cust_$tag"), primaryKey = Seq("customer_id"),
        dimensions = Seq(Dimension("country")),
        metrics = Seq(
          Metric("total_limit", agg = Some("sum"), sql = Some("credit_limit")),
          Metric("cust_count", agg = Some("count")),
          Metric("avg_limit", agg = Some("avg"), sql = Some("credit_limit"))),
        relationships = Seq(
          Relationship("pord", "one_to_many", foreignKey = Seq("customer_id")))),
      Model("pord", Table(s"p_ord_$tag"), primaryKey = Seq("order_id"),
        dimensions = Seq(Dimension("status")),
        metrics = Seq(Metric("order_count", agg = Some("count"))),
        relationships = Seq(
          Relationship("pcust", "many_to_one", foreignKey = Seq("customer_id")))))

  test("fan-out invariance: symmetric aggregation equals the DISTINCT-subquery answer") {
    for (seed <- 1L to 8L) {
      val w = sample(seed)
      w.customers.toDF("customer_id", "country", "credit_limit")
        .createOrReplaceTempView(s"p_cust_s$seed")
      w.orders.toDF("order_id", "customer_id", "status")
        .createOrReplaceTempView(s"p_ord_s$seed")
      val gen = new Generator(spark, catalogFor(s"s$seed"))
      val got = gen.plan(SemanticQuery(
        metrics = Seq("pcust.total_limit", "pcust.cust_count"),
        dimensions = Seq("pord.status"),
        orderBy = Seq("status"))).collect().map(_.toSeq).toSeq
      val want = spark.sql(
        s"""SELECT status, sum(credit_limit) AS total_limit,
           |  count(DISTINCT customer_id) AS cust_count
           |FROM (SELECT DISTINCT o.status, c.customer_id, c.credit_limit
           |      FROM p_cust_s$seed c LEFT JOIN p_ord_s$seed o
           |        ON o.customer_id = c.customer_id)
           |GROUP BY status ORDER BY status NULLS FIRST""".stripMargin)
        .collect().map(_.toSeq).toSeq
      assert(got == want, s"seed=$seed")
    }
  }

  test("fan-out invariance: forcing the 1:N join never changes the one-side global sum") {
    for (seed <- 9L to 14L) {
      val w = sample(seed)
      w.customers.toDF("customer_id", "country", "credit_limit")
        .createOrReplaceTempView(s"p_cust_f$seed")
      w.orders.toDF("order_id", "customer_id", "status")
        .createOrReplaceTempView(s"p_ord_f$seed")
      val gen = new Generator(spark, catalogFor(s"f$seed"))
      // filter keeps every order → the join must not change the sum over
      // customers that have at least one order
      val joined = gen.plan(SemanticQuery(
        metrics = Seq("pcust.total_limit"),
        filters = Seq("pord.order_count >= 0", "pord.status IS NOT NULL")))
        .collect()(0)
      val want = spark.sql(
        s"""SELECT sum(credit_limit) FROM p_cust_f$seed
           |WHERE customer_id IN (SELECT customer_id FROM p_ord_f$seed)""".stripMargin)
        .collect()(0)
      assert(Option(joined.get(0)) == Option(want.get(0)), s"seed=$seed")
    }
  }

  test("avg under fan-out equals sum/count of the deduplicated rows") {
    for (seed <- 15L to 18L) {
      val w = sample(seed)
      if (w.orders.nonEmpty) {
        w.customers.toDF("customer_id", "country", "credit_limit")
          .createOrReplaceTempView(s"p_cust_a$seed")
        w.orders.toDF("order_id", "customer_id", "status")
          .createOrReplaceTempView(s"p_ord_a$seed")
        val gen = new Generator(spark, catalogFor(s"a$seed"))
        val got = gen.plan(SemanticQuery(
          metrics = Seq("pcust.avg_limit"),
          dimensions = Seq("pord.status"),
          orderBy = Seq("status"))).collect().map(r => (Option(r.getString(0)), r.getDouble(1)))
        val want = spark.sql(
          s"""SELECT status, sum(credit_limit) / count(DISTINCT customer_id)
             |FROM (SELECT DISTINCT o.status, c.customer_id, c.credit_limit
             |      FROM p_cust_a$seed c LEFT JOIN p_ord_a$seed o
             |        ON o.customer_id = c.customer_id)
             |GROUP BY status ORDER BY status NULLS FIRST""".stripMargin)
          .collect().map(r => (Option(r.getString(0)), r.getDouble(1)))
        assert(got.sameElements(want), s"seed=$seed")
      }
    }
  }

  test("join paths over the TPC-H graph are well-formed chains") {
    val cat = TpchCatalog.build(TestSpark.sfDir)
    val g = new SemanticGraph(cat)
    val names = cat.models.keys.toSeq
      .filterNot(Set("events", "orders_secured", "events_secured"))
    for (a <- names; b <- names if a != b) {
      val hops =
        try g.path(a, b, Set(a, b))
        catch { case e: IllegalArgumentException =>
          // ambiguity is a contract outcome, not a failure — the graph has
          // genuinely tied shortest routes (e.g. customer→part via orders
          // chain vs nation→supplier junction shortcut)
          assert(e.getMessage.contains("Ambiguous join path"))
          Nil
        }
      if (hops.isEmpty && a != b) { /* ambiguous pair skipped */ }
      else
      // chain property: consecutive hops link, ends are correct
      assert(hops.head.fromModel == a && hops.last.toModel == b, s"$a→$b")
      hops.sliding(2).foreach {
        case Seq(x, y) => assert(x.toModel == y.fromModel, s"$a→$b broken chain")
        case _ => ()
      }
      // no model visited twice
      val visited = a +: hops.map(_.toModel)
      assert(visited.distinct == visited, s"$a→$b revisits a model")
    }
  }
}
