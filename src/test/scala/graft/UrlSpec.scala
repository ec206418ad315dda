package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.UrlFunctions

/** Fixture spec for X133 URL canonicalization: alias collapse (the point
  * of the operator — raw-distinct URLs of the same resource share one
  * canonical key) and param handling the hash gate can't explain. */
class UrlSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url").select(UrlFunctions.urlCanonicalize(col("url")))
      .collect().map(_.getString(0)).toSeq

  test("scheme case, www., :443, index.html, fragment and utm all alias") {
    val out = canon(
      "https://a.com/p/1?id=1",
      "HTTPS://WWW.A.COM:443/p/1?id=1#frag",
      "https://a.com/p/1/index.html?utm_campaign=x&id=1"
    )
    assert(out(0) == "https://a.com/p/1?id=1")
    assert(out(1) == out(0))
    // index.html collapses to a trailing slash — a DIFFERENT path than
    // /p/1: directory-default normalization, not path equality
    assert(out(2) == "https://a.com/p/1/?id=1")
  }

  test("non-tracking params survive in sorted order; empty query drops ?") {
    val out = canon(
      "https://b.com/x?z=2&a=1&utm_source=s&ref=tw",
      "https://b.com/x?utm_source=s&ref=tw",
      "https://b.com/x")
    assert(out(0) == "https://b.com/x?a=1&z=2")
    assert(out(1) == "https://b.com/x")
    assert(out(2) == "https://b.com/x")
  }

  test("empty path normalizes to /") {
    assert(canon("https://c.com?id=3") == Seq("https://c.com/?id=3"))
  }
}
