package graft

import org.apache.spark.sql.functions._
import graft.functions.{UrlFunctions => U}

class UrlFunctionsSpec extends SparkSpec {

  private def canon(url: String): String = {
    import spark.implicits._
    Seq(url).toDF("u").select(U.canonicalizeUrl(col("u"))).head.getString(0)
  }

  test("canonicalizeUrl: lowercases scheme and host, keeps path case") {
    assert(canon("HTTP://WWW.Example.COM/A/B") == "http://www.example.com/A/B")
  }

  test("canonicalizeUrl: strips default ports, keeps explicit ones") {
    assert(canon("http://x.com:80/a") == "http://x.com/a")
    assert(canon("https://x.com:443/a") == "https://x.com/a")
    assert(canon("https://x.com:8080/a") == "https://x.com:8080/a")
    // http's default is NOT https's default
    assert(canon("https://x.com:80/a") == "https://x.com:80/a")
  }

  test("canonicalizeUrl: drops userinfo") {
    assert(canon("https://user:pw@X.com/a") == "https://x.com/a")
  }

  test("canonicalizeUrl: collapses duplicate slashes, strips trailing slash, root stays /") {
    assert(canon("https://x.com//a///b/") == "https://x.com/a/b")
    assert(canon("https://x.com/") == "https://x.com/")
    assert(canon("https://x.com") == "https://x.com/")
  }

  test("canonicalizeUrl: drops fragment and tracking params, sorts survivors") {
    assert(canon("https://x.com/a?z=1&utm_source=s&a=2#frag") ==
      "https://x.com/a?a=2&z=1")
    assert(canon("https://x.com/a?fbclid=abc") == "https://x.com/a")
    assert(canon("https://x.com/a?gclid=1&mc_cid=2&msclkid=3&mc_eid=4") ==
      "https://x.com/a")
  }

  test("canonicalizeUrl: empty query canonicalizes away entirely") {
    assert(canon("https://x.com/a?") == "https://x.com/a")
    assert(canon("https://x.com/a?#f") == "https://x.com/a")
  }

  test("canonicalizeUrl: parameter ORDER never splits a dedup group") {
    assert(canon("https://x.com/a?b=2&a=1") == canon("https://x.com/a?a=1&b=2"))
  }

  test("canonicalizeUrl: functional params like ref survive; utm_ matches whole names only") {
    // ref is functional on many sites (?ref=branch) — NOT stripped
    assert(canon("https://x.com/a?ref=main") == "https://x.com/a?ref=main")
    assert(canon("https://x.com/a?refresh=1") == "https://x.com/a?refresh=1")
  }

  test("canonicalizeUrl: a '?' inside the fragment never fabricates a query") {
    assert(canon("https://x.com/a#f?b=1") == "https://x.com/a")
    // SPA hash-route: everything after # drops, empty path → /
    assert(canon("https://x.com/#/page?tab=2") == "https://x.com/")
  }

  test("canonicalizeUrl: the FIRST '?' starts the query — a '?' in a param value stays") {
    // unencoded redirect target: the real query is url=...; its embedded
    // '?x=1' must not displace it
    assert(canon("https://s.com/r?url=https://other.com/p?x=1") ==
      "https://s.com/r?url=https://other.com/p?x=1")
  }

  test("canonicalizeUrl: non-absolute input canonicalizes to NULL, not a shared key") {
    assert(canon("garbage") == null)
    assert(canon("/relative/path?a=1") == null)
    assert(canon("mailto:someone@example.com") == null)
  }
}
