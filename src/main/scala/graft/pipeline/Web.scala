package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Web-corpus URL operators — the curation layer a crawl-derived
  * training corpus needs before any text-level dedup runs: URL
  * canonicalization, host / registered-domain extraction, per-domain
  * corpus accounting, domain blocklists, and URL-level dedup
  * (CCNet/RefinedWeb-style pipelines all start here; the reference has
  * no web layer — this is beyond-reference surface).
  *
  * Everything is a narrow projection over built-in string expressions
  * (regexp_replace / regexp_extract / split), so it rides whole-stage
  * codegen, pushes column pruning to the scan, and shuffles only for
  * the final per-domain / per-key aggregates — at 100 TB the URL column
  * is the ONLY column these stages move.
  *
  * Normalization rules (documented contract, every rule a
  * single-purpose regex):
  *   1. drop the fragment (`#…`)
  *   2. lowercase the scheme and authority (path/query case preserved)
  *   3. strip explicit default ports (`http://h:80`, `https://h:443`)
  *   4. strip tracking parameters (`utm_*`, `fbclid`, `gclid`,
  *      `msclkid`) wherever they sit in the query
  *   5. repair the separator if rule 4 removed the leading `?` param
  *   6. drop a now-empty query (`?`/`&` tail)
  *   7. drop the trailing slash of a bare-authority URL
  *
  * Known tradeoff: a literal `&` in a PATH (no query) is read as a
  * query separator by rule 5 — the canonical form is still
  * deterministic and self-consistent, which is what a dedup key needs.
  */
object Web {

  /** Query parameters stripped by [[normalizeUrl]] (rule 4). */
  val trackingParams = "utm_[a-z0-9_]+|fbclid|gclid|msclkid"

  /** Two-level public suffixes recognized by [[registeredDomain]] —
    * the high-traffic subset; a production deployment would swap in the
    * full public-suffix list as a broadcast lookup, same plan shape. */
  val twoLevelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp", "co.in", "co.kr", "com.br", "com.cn",
    "com.mx", "com.tr", "com.ar", "co.za", "com.sg", "co.nz")

  /** Canonical form of an absolute http(s) URL column (rules above). */
  def normalizeUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*", "")
    val lowered = concat(
      lower(regexp_extract(noFrag, "^([^:/?#]+://[^/?#]*)", 1)),
      regexp_replace(noFrag, "^[^:/?#]+://[^/?#]*", ""))
    val noPort = regexp_replace(
      regexp_replace(lowered, "^(http://[^/:?#]+):80([/?#]|$)", "$1$2"),
      "^(https://[^/:?#]+):443([/?#]|$)", "$1$2")
    val noTrack =
      regexp_replace(noPort, s"[?&]($trackingParams)=[^&#]*", "")
    val fixedSep = regexp_replace(noTrack, "^([^?]*)&", "$1?")
    val noTail = regexp_replace(fixedSep, "[?&]+$", "")
    regexp_replace(noTail, "^(https?://[^/?#]+)/$", "$1")
  }

  /** Lowercased hostname of a URL column (port excluded). */
  def host(u: Column): Column =
    lower(regexp_extract(u, "^[^:/?#]+://([^/:?#]+)", 1))

  /** Registered domain of a hostname column: the last two labels, or
    * the last three when the final two form a known two-level public
    * suffix ([[twoLevelSuffixes]]). Single-label hosts pass through. */
  def registeredDomain(h: Column): Column = {
    val parts = split(h, "\\.")
    val np = size(parts)
    val last2 = concat_ws(".", element_at(parts, -2), element_at(parts, -1))
    when(np >= 3 && last2.isin(twoLevelSuffixes: _*),
        concat_ws(".", element_at(parts, -3), last2))
      .when(np >= 2, last2)
      .otherwise(h)
  }

  /** The URL-dedup key: [[normalizeUrl]] minus the scheme and a leading
    * `www.` — `http://www.A/x` and `https://A/x` collapse to one key. */
  def urlKey(u: Column): Column =
    regexp_replace(
      regexp_replace(normalizeUrl(u), "^https?://", ""), "^www\\.", "")

  /** Per-registered-domain corpus accounting: document count, distinct
    * host count, plus any caller-supplied aggregates (already aliased).
    * One hash aggregate on the domain key — domain-cardinality state. */
  def hostStats(docs: DataFrame, urlCol: String,
                extraAggs: Seq[Column] = Nil): DataFrame = {
    val base = docs.withColumn("host", host(col(urlCol)))
      .withColumn("domain", registeredDomain(col("host")))
    val aggs = countDistinct(col("host")).as("n_hosts") +: extraAggs
    base.groupBy("domain").agg(count(lit(1)).as("n_docs"), aggs: _*)
  }

  /** Drop documents whose registered domain is in `blocked` (a
    * one-column `domain` relation). Broadcast anti-join — the blocklist
    * is domain-sized, never corpus-sized. */
  def blocklistFilter(docs: DataFrame, urlCol: String,
                      blocked: DataFrame): DataFrame = {
    val keyed = docs.withColumn("__domain",
      registeredDomain(host(col(urlCol))))
    keyed.join(broadcast(blocked.select(col("domain").as("__domain"))),
        Seq("__domain"), "left_anti")
      .drop("__domain")
  }

  /** Host-level link graph from raw pages: one distinct
    * (src_host, dst_host) edge per host pair where some page on
    * `src_host` links an absolute URL on `dst_host`. Relative links
    * (no authority) and self-links are dropped. Composes
    * [[Html.links]] with [[host]]; feed the result to
    * [[graft.operators.PageRank.rankKeyed]] for the host-centrality
    * quality prior crawl curation uses (Common Crawl publishes exactly
    * this signal). The edge relation is host-cardinality — tiny next
    * to the corpus — and the only shuffle is its distinct. */
  def hostLinkEdges(pages: DataFrame, urlCol: String,
                    htmlCol: String): DataFrame =
    pages.select(host(col(urlCol)).as("src"),
        explode(Html.links(col(htmlCol))).as("link"))
      .select(col("src"), host(col("link")).as("dst"))
      .where(col("dst") =!= "" && col("dst") =!= col("src"))
      .distinct()

  /** Anchor-text aggregation per TARGET host — what the rest of the
    * web calls each destination ([[Html.anchors]] extracts the pairs):
    * `n_hosts` distinct linking hosts and `n_links` total anchors per
    * (dst, anchor). The external relevance/quality signal crawl
    * pipelines join onto a page's own text (a target described by many
    * INDEPENDENT hosts with the same words is what the anchor-text
    * retrieval literature exploits). Self-links, hostless (relative)
    * hrefs, and empty anchor texts drop. One exchange on the (dst,
    * anchor) key; the distinct-host count rides the same aggregate. */
  def anchorTexts(pages: DataFrame, urlCol: String,
                  htmlCol: String): DataFrame =
    anchorTextsFromState(anchorTextState(pages, urlCol, htmlCol))

  /** The mergeable STATE behind [[anchorTexts]]: per-(dst, anchor,
    * src-host) link counts. `n_hosts` is a DISTINCT count, so the state
    * must keep the src key — per-(dst, anchor) rollups from two batches
    * could not be merged without double-counting a host linking in
    * both. Counts over PAGE-DISJOINT batches are additive (each page's
    * anchors parse once, in exactly one batch): a crawl-ingest pipeline
    * persists this relation and folds each batch in via
    * [[mergeAnchorState]] — no corpus re-parse, the
    * [[graft.pipeline.Dedup.lineDocCounts]] state shape. */
  def anchorTextState(pages: DataFrame, urlCol: String,
                      htmlCol: String): DataFrame =
    pages.select(host(col(urlCol)).as("src"),
        explode(Html.anchors(col(htmlCol))).as("a"))
      .select(col("src"), host(col("a.href")).as("dst"),
        col("a.text").as("anchor"))
      .where(col("dst") =!= "" && col("dst") =!= col("src") &&
        col("anchor") =!= "")
      .groupBy("dst", "anchor", "src")
      .agg(count(lit(1)).as("n_links"))

  /** Merge two [[anchorTextState]] relations built over PAGE-DISJOINT
    * batches: one map-side-combined sum per (dst, anchor, src). */
  def mergeAnchorState(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("dst", "anchor", "src")
      .agg(sum(col("n_links")).as("n_links"))

  /** The [[anchorTexts]] report from a (merged) state relation: src
    * rows are unique per (dst, anchor) by construction, so the distinct
    * host count is a plain row count — gated `web_anchor_text_incr`:
    * merged-state report ≡ one-shot report row for row. */
  def anchorTextsFromState(state: DataFrame): DataFrame =
    state.groupBy("dst", "anchor")
      .agg(count(lit(1)).as("n_hosts"), sum(col("n_links")).as("n_links"))

  /** The SKETCH form of the anchor state for crawls where even the
    * (dst, anchor, src) relation outgrows a table: per (dst, anchor),
    * the exact additive link count plus a DataSketches HLL of the
    * linking hosts — (dst, anchor)-sized regardless of host fan-in,
    * the src key the exact state must carry replaced by constant
    * sketch bytes. Mergeable like the diversity sketch: counts add,
    * sketches union (accuracy-lossless, not register-identical — the
    * gate bounds estimates against exact, never equates). */
  def anchorTextSketchState(pages: DataFrame, urlCol: String,
                            htmlCol: String, lgK: Int = 12): DataFrame =
    pages.select(host(col(urlCol)).as("src"),
        explode(Html.anchors(col(htmlCol))).as("a"))
      .select(col("src"), host(col("a.href")).as("dst"),
        col("a.text").as("anchor"))
      .where(col("dst") =!= "" && col("dst") =!= col("src") &&
        col("anchor") =!= "")
      .groupBy("dst", "anchor")
      .agg(count(lit(1)).as("n_links"),
        hll_sketch_agg(col("src"), lit(lgK)).as("host_sketch"))

  /** Merge two [[anchorTextSketchState]] relations over PAGE-DISJOINT
    * batches: counts add, host sketches union. */
  def mergeAnchorSketches(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("dst", "anchor")
      .agg(sum(col("n_links")).as("n_links"),
        hll_union_agg(col("host_sketch"), lit(false)).as("host_sketch"))

  /** The anchor-text report from (merged) sketch state:
    * (dst, anchor, n_hosts_est, n_links). */
  def anchorTextsFromSketch(state: DataFrame): DataFrame =
    state.select(col("dst"), col("anchor"),
      round(hll_sketch_estimate(col("host_sketch"))).cast("long")
        .as("n_hosts_est"),
      col("n_links"))

  /** URL-level dedup: one row per [[urlKey]] with the kept (minimum)
    * id and the duplicate count. The first dedup a crawl corpus runs —
    * one hash aggregate on the key, no text is touched or moved. */
  def dedupByUrl(docs: DataFrame, urlCol: String,
                 idCol: String = "doc_id"): DataFrame =
    docs.select(urlKey(col(urlCol)).as("url_key"), col(idCol))
      .groupBy("url_key")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))
}
