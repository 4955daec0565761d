package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** URL canonicalization contract cases and the per-domain operators. */
class WebSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def norm(u: String): String =
    Seq(u).toDF("u").select(Web.normalizeUrl(col("u"))).head().getString(0)

  private def dom(h: String): String =
    Seq(h).toDF("h").select(Web.registeredDomain(col("h"))).head().getString(0)

  private def key(u: String): String =
    Seq(u).toDF("u").select(Web.urlKey(col("u"))).head().getString(0)

  test("normalizeUrl: each documented rule") {
    // fragment + case + default port + tracking param, all at once
    assert(norm("HTTPS://WWW.Example.COM:443/Path/Pg?utm_source=x&id=3#f")
      === "https://www.example.com/Path/Pg?id=3")
    // path/query case preserved, only scheme+authority lowered
    assert(norm("HTTP://HOST.ORG/CaseD/Path?Q=UPPER")
      === "http://host.org/CaseD/Path?Q=UPPER")
    // default port + bare authority trailing slash
    assert(norm("http://Host.org:80/") === "http://host.org")
    // NON-default port survives
    assert(norm("http://host.org:8080/a") === "http://host.org:8080/a")
    // query that becomes empty disappears entirely
    assert(norm("https://a.b/?utm_a=1") === "https://a.b")
    // tracking param in the middle of the query
    assert(norm("http://h/p?a=1&utm_x=2&b=3") === "http://h/p?a=1&b=3")
    // tracking param FIRST: separator repaired
    assert(norm("http://h/p?utm_x=2&b=3&fbclid=z") === "http://h/p?b=3")
    // already-canonical input is a fixed point
    val canon = "https://sub.example.co.uk/a/b?x=1&y=2"
    assert(norm(canon) === canon)
  }

  test("registeredDomain: plain, deep, two-level suffix, single label") {
    assert(dom("example.com") === "example.com")
    assert(dom("a.b.example.com") === "example.com")
    assert(dom("www.example.co.uk") === "example.co.uk")
    assert(dom("example.co.uk") === "example.co.uk")
    assert(dom("localhost") === "localhost")
  }

  test("urlKey collapses scheme and www variants") {
    assert(key("https://www.Example.com/x?utm_a=1")
      === key("http://example.com/x"))
    assert(key("http://cdn.example.com/x") !== key("http://example.com/x"))
  }

  test("dedupByUrl keeps the minimum id per key with the dup count") {
    val docs = Seq(
      (1L, "https://www.a.com/p"), (2L, "http://a.com/p#top"),
      (3L, "https://A.COM/p?utm_x=1"), (4L, "https://a.com/q"))
      .toDF("doc_id", "url")
    val out = Web.dedupByUrl(docs, "url").orderBy("keep_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(("a.com/p", 1L, 3L), ("a.com/q", 4L, 1L)))
  }

  test("blocklistFilter drops by registered domain, keeps the rest") {
    val docs = Seq(
      (1L, "https://spam.bad.co.uk/x"), (2L, "https://ok.com/y"),
      (3L, "http://www.bad.co.uk/z"))
      .toDF("doc_id", "url")
    val blocked = Seq("bad.co.uk").toDF("domain")
    val kept = Web.blocklistFilter(docs, "url", blocked)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(2L))
  }

  test("hostStats aggregates per registered domain with extra aggs") {
    val docs = Seq(
      (1L, "https://a.ex.com/1", 10L), (2L, "https://b.ex.com/2", 20L),
      (3L, "https://ex.com/3", 30L), (4L, "https://other.org/4", 5L))
      .toDF("doc_id", "url", "n_chars")
    val out = Web.hostStats(docs, "url",
        Seq(sum(col("n_chars")).as("sum_chars")))
      .orderBy("domain")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(out.toSeq === Seq(
      ("ex.com", 3L, 3L, 60L), ("other.org", 1L, 1L, 5L)))
  }

  test("hostLinkEdges: host-level distinct edges, relative and " +
      "self links dropped, authority lowercased") {
    val pages = Seq(
      (1L, "https://a.com/x",
        """<a href="https://B.com/1">b</a> <a href="/rel/2">r</a>
          |<a href="https://a.com/self">s</a>
          |<a href="https://b.com/other">b2</a>""".stripMargin),
      (2L, "https://a.com/y", "<a href=\"https://b.com/3\">b</a>"),
      (3L, "https://c.org/z", "no links at all"))
      .toDF("doc_id", "url", "html")
    val edges = Web.hostLinkEdges(pages, "url", "html")
      .orderBy("src", "dst")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    // B.com lowercases into b.com; the two a.com→b.com pages collapse
    assert(edges === Seq(("a.com", "b.com")))
    // plan audit: the only shuffle is the host-level distinct
    val plan = Web.hostLinkEdges(pages, "url", "html")
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1,
      s"want exactly 1 exchange (the distinct):\n$plan")
  }
}
