package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML → text extraction — the step a crawl-derived corpus runs
  * between the WARC fetch and every text-level operator (C4, CCNet,
  * RefinedWeb and FineWeb all start from an HTML boilerplate strip;
  * the reference has no web layer — beyond-reference surface, the
  * markup-side sibling of [[Web]]'s URL layer).
  *
  * Everything is a chain of built-in string expressions
  * (`regexp_replace` / `regexp_extract` / `replace`), so extraction is
  * one whole-stage-codegen projection: no UDF, no shuffle, and at
  * 100 TB the html column is read once and never moved.
  *
  * Extraction rules (documented contract, every rule a single-purpose
  * regex; all case-insensitive, dot-matches-newline):
  *   1. drop comments (`<!-- … -->`) — first, they may wrap tags
  *   2. drop `<script>` blocks including content
  *   3. drop `<style>` blocks including content
  *   4. drop the `<head>` block including content (title/meta are
  *      metadata, not body text — [[title]] reads it separately)
  *   5. strip every remaining tag (`<…>`) to a space
  *   6. decode the common entities (`&lt; &gt; &quot; &#39; &nbsp;`,
  *      then `&amp;` LAST so `&amp;lt;` decodes to the literal `&lt;`)
  *   7. collapse whitespace runs to one space and trim
  *
  * Known tradeoff: rule 5 is a regex tag strip, not an HTML5 parser —
  * a bare `<` in running text that is not markup would open a false
  * "tag" until the next `>`. Real extraction quality work swaps rules
  * 1-5 for a parser behind the SAME column contract; the plan shape
  * (one projection) does not change.
  */
object Html {

  private def dropBlock(c: Column, tag: String): Column =
    regexp_replace(c, s"(?is)<$tag\\b[^>]*>.*?</$tag>", " ")

  /** Rule-6 entity decode (shared by [[extractText]] and [[title]]). */
  def decodeEntities(c: Column): Column = {
    val steps = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
    steps.foldLeft(c) { case (acc, (from, to)) =>
      replace(acc, lit(from), lit(to))
    }
  }

  /** Rule-7 whitespace collapse + trim. */
  def collapseWs(c: Column): Column =
    trim(regexp_replace(c, "\\s+", " "))

  /** Visible body text of an HTML column (rules 1-7 above). */
  def extractText(h: Column): Column = {
    val noComment = regexp_replace(h, "(?s)<!--.*?-->", " ")
    val noScript = dropBlock(noComment, "script")
    val noStyle = dropBlock(noScript, "style")
    val noHead = dropBlock(noStyle, "head")
    val noTags = regexp_replace(noHead, "(?s)<[^>]*>", " ")
    collapseWs(decodeEntities(noTags))
  }

  /** `<title>` text (first match), entity-decoded and collapsed;
    * empty string when the document has no title element. */
  def title(h: Column): Column =
    collapseWs(decodeEntities(
      regexp_extract(h, "(?is)<title[^>]*>(.*?)</title>", 1)))

  /** Double-quoted `href` targets of `<a>` tags, in document order
    * (the outlink relation [[Web.normalizeUrl]] consumes). */
  def links(h: Column): Column =
    regexp_extract_all(h,
      lit("(?is)<a\\b[^>]*href\\s*=\\s*\"([^\"]*)\""), lit(1))

  /** (href, anchor text) pairs of double-quoted `<a>` tags in document
    * order — anchor text is what the LINKING page calls the target,
    * the classic external relevance/quality signal web corpora
    * aggregate per target ([[Web.anchorTexts]]). Both component
    * arrays come from the SAME pattern (groups 1 and 2), so they zip
    * positionally; the text leg strips nested tags, decodes entities,
    * and collapses whitespace. Java∩RE2 regex (the [[graft.pipeline
    * .Redact]] discipline) so an engine oracle can replay it. */
  def anchors(h: Column): Column = {
    val pat = "(?is)<a\\b[^>]*href\\s*=\\s*\"([^\"]*)\"[^>]*>(.*?)</a>"
    val texts = transform(regexp_extract_all(h, lit(pat), lit(2)),
      t => trim(collapseWs(decodeEntities(
        regexp_replace(t, "<[^>]*>", " ")))))
    arrays_zip(regexp_extract_all(h, lit(pat), lit(1)).as("href"),
      texts.as("text"))
  }

  /** Text-density signal in exact integer per-mille: ⌊1000·|text|/|html|⌋
    * (0 for empty html). Boilerplate-heavy pages score low — the
    * cheap pre-filter crawl pipelines apply before any text scoring. */
  def textDensityMilli(h: Column, text: Column): Column =
    when(length(h) === 0, lit(0L)).otherwise(
      floor(length(text).cast("long") * 1000 / length(h))).cast("long")

  /** One-projection extraction relation: id, [[title]], [[extractText]]
    * as `clean_text`, link count + space-joined link list, and the
    * [[textDensityMilli]] signal. */
  def extract(docs: DataFrame, htmlCol: String,
              idCol: String = "doc_id"): DataFrame = {
    val h = col(htmlCol)
    val txt = extractText(h)
    docs.select(col(idCol), title(h).as("title"), txt.as("clean_text"),
      size(links(h)).cast("long").as("n_links"),
      array_join(links(h), " ").as("links"),
      textDensityMilli(h, txt).as("density_milli"))
  }
}
