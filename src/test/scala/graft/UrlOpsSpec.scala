package graft

import graft.ops.UrlOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** URL canonicalization rules ([[UrlOps.canonicalizeUrl]]) one by one,
  * the rules deliberately NOT applied, junk-input passthrough, and the
  * dedup collapse ([[UrlOps.urlDedup]]) including null-URL rows. */
class UrlOpsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def canon(url: String): String =
    Seq(url).toDF("u")
      .select(UrlOps.canonicalizeUrl(col("u"))).head.getString(0)

  test("scheme and host lowercase; path case preserved") {
    assert(canon("HTTP://Example.COM/Path/File.HTML") ===
      "http://example.com/Path/File.HTML")
  }

  test("fragment stripped, default ports dropped, explicit ports kept") {
    assert(canon("http://a.com:80/x#frag") === "http://a.com/x")
    assert(canon("https://a.com:443/x?q=1#f") === "https://a.com/x?q=1")
    assert(canon("http://a.com:8080/x") === "http://a.com:8080/x")
    // :443 is only a default for https (and :80 only for http)
    assert(canon("http://a.com:443/x") === "http://a.com:443/x")
    assert(canon("http://a.com:80") === "http://a.com")
  }

  test("tracking params dropped wherever they sit; rest sorted") {
    assert(canon("http://a.com/x?utm_source=s&b=2&a=1") ===
      "http://a.com/x?a=1&b=2")
    assert(canon("http://a.com/x?b=2&gclid=g&a=1") ===
      "http://a.com/x?a=1&b=2")
    assert(canon("http://a.com/x?fbclid=f&msclkid=m&utm_a=1") ===
      "http://a.com/x")
    assert(canon("http://a.com/x?") === "http://a.com/x")
  }

  test("trailing and doubled '&' collapse with the plain spelling") {
    assert(canon("http://a.com/x?a=1&") === "http://a.com/x?a=1")
    assert(canon("http://a.com/x?a=1&&b=2") === "http://a.com/x?a=1&b=2")
    assert(canon("http://a.com/x?a=1&") === canon("http://a.com/x?a=1"))
    // a query of nothing but separators is an empty query
    assert(canon("http://a.com/x?&&") === "http://a.com/x")
  }

  test("over-merging rules are NOT applied") {
    assert(canon("http://www.a.com/x/") === "http://www.a.com/x/")
    assert(canon("http://a.com/%7Euser") === "http://a.com/%7Euser")
    assert(canon("http://a.com/index.html") === "http://a.com/index.html")
  }

  test("non-URL junk passes through modulo trim; whitespace trimmed") {
    assert(canon("not a url at all") === "not a url at all")
    assert(canon("  https://a.com/x?  ") === "https://a.com/x")
  }

  test("urlDedup keeps the min-id row per canonical and passes nulls") {
    val rows = Seq(
      (1L, "http://A.com/p?b=2&a=1"),
      (2L, "HTTP://a.COM:80/p?a=1&b=2#f"), // same canonical as id 1
      (3L, "http://a.com/p?a=1&b=2&utm_x=9"), // same again
      (4L, "http://a.com/other"),
      (5L, null.asInstanceOf[String]),
      (6L, null.asInstanceOf[String]))
      .toDF("id", "url")
    val kept = UrlOps.urlDedup(rows, "id", "url")
      .select("id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(1L, 4L, 5L, 6L))
  }

  test("canonicalizeUrl agrees between two spellings of the same page") {
    val a = canon("http://Shop.example.com/item/7?a=1&b=2")
    val b = canon("HTTP://shop.example.COM:80/item/7?b=2&a=1&utm_c=9#x")
    assert(a === b)
    assert(UrlOps.urlDedup(
      Seq((10L, "http://Shop.example.com/item/7?a=1&b=2"),
        (11L, "HTTP://shop.example.COM:80/item/7?b=2&a=1&utm_c=9#x"))
        .toDF("id", "url"), "id", "url").count() === 1L)
  }

  test("urlDedup works on non-numeric (UUID-style) ids — no silent drop") {
    val rows = Seq(
      ("b-uuid", "http://a.com/p?x=1"),
      ("a-uuid", "http://A.com:80/p?x=1#f"), // same canonical, smaller id
      ("c-uuid", "http://a.com/q"),
      ("d-uuid", null.asInstanceOf[String]))
      .toDF("id", "url")
    val kept = UrlOps.urlDedup(rows, "id", "url")
      .select("id").as[String].collect().sorted
    assert(kept.toSeq === Seq("a-uuid", "c-uuid", "d-uuid"))
  }

  test("urlHost extracts the lowercased authority host") {
    val h = Seq("https://CDN.Example.com:443/a").toDF("u")
      .select(UrlOps.urlHost(col("u"))).head.getString(0)
    assert(h === "cdn.example.com")
  }
}
