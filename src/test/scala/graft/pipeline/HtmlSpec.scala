package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** HTML → text extraction contract cases. */
class HtmlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def text(h: String): String =
    Seq(h).toDF("h").select(Html.extractText(col("h"))).head().getString(0)

  private def title(h: String): String =
    Seq(h).toDF("h").select(Html.title(col("h"))).head().getString(0)

  private def links(h: String): Seq[String] =
    Seq(h).toDF("h").select(Html.links(col("h"))).head().getSeq[String](0)

  test("extractText: tags stripped, head/script/style/comments dropped " +
      "with their CONTENT, body text survives") {
    val h = """<html><HEAD><title>T</title><meta x="y"></HEAD>
      |<body><h1>Hello</h1>
      |<script type="text/js">var x = 1 < 2; // <b>not text</b>
      |more script</script>
      |<STYLE>body { color: red; }</STYLE>
      |<!-- a comment with <p>tags</p> inside -->
      |<p>world <b>bold</b> text</p></body></html>""".stripMargin
    assert(text(h) === "Hello world bold text")
  }

  test("extractText: entities decode, &amp; last (no double decode)") {
    assert(text("<p>a &lt;b&gt; &quot;c&quot; &#39;d&#39; e&nbsp;f &amp; g</p>")
      === "a <b> \"c\" 'd' e f & g")
    // literal "&lt;" encoded as &amp;lt; stays as the four chars &lt;
    assert(text("<p>&amp;lt;</p>") === "&lt;")
  }

  test("extractText: whitespace runs collapse, result trimmed; " +
      "markup-free text is a fixed point") {
    assert(text("  <div>\n\ta\n\n  b\t c </div> ") === "a b c")
    assert(text("plain tokens only") === "plain tokens only")
  }

  test("title: first title element, attributes allowed, case-insensitive, " +
      "entity-decoded; empty when absent") {
    assert(title("<TITLE lang=\"en\">A &amp; B\n C</TITLE><title>x</title>")
      === "A & B C")
    assert(title("<p>no title</p>") === "")
  }

  test("links: double-quoted hrefs in document order; empty when none") {
    assert(links("""<a href="u1">x</a> <A CLASS="c" HREF="u2">y</A>
      |<a name="no-href">z</a>""".stripMargin) === Seq("u1", "u2"))
    assert(links("<p>none</p>") === Seq.empty)
  }

  test("anchors: (href, text) pairs zip positionally; nested tags and " +
      "entities cleaned from the text leg") {
    val h = """<a href="u1">Plain</a>
      |<A CLASS="c" HREF="u2"><b>Bold</b> &amp; nested</A>
      |<a name="no-href">skipped</a>
      |<a href="u3"></a>""".stripMargin
    val got = Seq(h).toDF("h").select(Html.anchors(col("h")).as("a"))
      .selectExpr("inline(a)").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got === Seq(("u1", "Plain"), ("u2", "Bold & nested"),
      ("u3", "")))
  }

  test("anchorTexts: per-target aggregation drops relative hrefs, " +
      "self-links and empty anchors; distinct hosts counted") {
    val pages = Seq(
      ("https://a.com/1",
        """<a href="https://t.com/x">buy now</a>
          |<a href="/rel/1">rel</a>
          |<a href="https://a.com/self">self</a>""".stripMargin),
      ("https://b.com/2", """<a href="https://t.com/y">buy now</a>"""),
      ("https://a.com/3",
        """<a href="https://t.com/z">buy now</a>
          |<a href="https://t.com/w"></a>""".stripMargin))
      .toDF("url", "html")
    val got = Web.anchorTexts(pages, "url", "html").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got === Seq(("t.com", "buy now", 2L, 3L)))
  }

  test("extract: one-projection relation with density signal") {
    val docs = Seq(
      (1L, "<html><head><title>T1</title></head><body><p>ab cd</p>" +
        "<a href=\"u\">l</a></body></html>"),
      (2L, "just text")).toDF("doc_id", "html")
    val rows = Html.extract(docs, "html").orderBy("doc_id").collect()
    assert(rows(0).getLong(0) === 1L)
    assert(rows(0).getString(1) === "T1")
    assert(rows(0).getString(2) === "ab cd l")
    assert(rows(0).getLong(3) === 1L)
    assert(rows(0).getString(4) === "u")
    // density = floor(1000 * len("ab cd l") / len(html))
    val hLen = docs.where(col("doc_id") === 1).head().getString(1).length
    assert(rows(0).getLong(5) === 1000L * 7 / hLen)
    // markup-free doc: text is the identity, density floor(1000*9/9)=1000
    assert(rows(1).getString(2) === "just text")
    assert(rows(1).getLong(3) === 0L && rows(1).getString(4) === "")
    assert(rows(1).getLong(5) === 1000L)
  }

  test("plan audit: extract is ONE shuffle-free codegen projection") {
    // range-derived input: a literal Seq constant-folds into a
    // LocalTableScan and hides the projection
    val docs = spark.range(8).select(col("id").as("doc_id"),
      concat(lit("<p>x "), col("id"), lit("</p>")).as("html"))
    val plan = Html.extract(docs, "html")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"want no exchange:\n$plan")
    // the leading '*(1)' star marks the whole-stage-codegen stage
    assert(plan.contains("*(1) Project"), s"want codegen projection:\n$plan")
  }
}
