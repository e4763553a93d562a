package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Edge cases for [[TextFunctions.canonicalizeUrl]] beyond the four
  * mess classes the oracled query (`tx_url_canonicalize`) constructs:
  * non-default ports kept, cross-scheme default ports kept, utm-only
  * queries collapse to no query, bytewise param sort, root paths.
  */
class UrlCanonSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u")
      .select(TextFunctions.canonicalizeUrl($"u").as("c"))
      .as[String].collect().toSeq

  test("scheme/host lowercased, default port and www stripped, fragment dropped") {
    assert(canon("HTTPS://WWW.Example.COM:443/A/b/?utm_source=x&b=2&a=1#frag")
      == Seq("https://example.com/A/b?a=1&b=2"))
  }

  test("path case is preserved; only scheme and host fold") {
    assert(canon("HTTP://EXAMPLE.com/CaseSensitive/Path")
      == Seq("http://example.com/CaseSensitive/Path"))
  }

  test("non-default port survives; http default on https survives") {
    assert(canon(
      "https://example.com:8443/x",
      "https://example.com:80/x", // 80 is NOT the https default — keep
      "http://example.com:443/x"  // 443 is NOT the http default — keep
    ) == Seq(
      "https://example.com:8443/x",
      "https://example.com:80/x",
      "http://example.com:443/x"))
  }

  test("utm-only query collapses to no query; empty params dropped") {
    assert(canon("https://example.com/a?utm_source=x&utm_medium=y")
      == Seq("https://example.com/a"))
    assert(canon("https://example.com/a?&&b=1&")
      == Seq("https://example.com/a?b=1"))
  }

  test("query param order never splits a URL") {
    val Seq(x, y) = canon(
      "https://example.com/a?z=1&a=2&m=3",
      "https://example.com/a?m=3&z=1&a=2")
    assert(x == y && x == "https://example.com/a?a=2&m=3&z=1")
  }

  test("root URL and trailing slashes") {
    assert(canon("https://www.example.com/", "https://example.com")
      == Seq("https://example.com", "https://example.com"))
    assert(canon("http://example.com/a///") == Seq("http://example.com/a"))
  }
}
