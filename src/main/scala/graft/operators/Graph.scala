package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics beyond centrality ([[PageRank]]): triangle counting
  * with local clustering coefficients, and HITS hubs/authorities — the
  * structural signals web-corpus curation layers on top of a link or
  * co-occurrence graph (spam farms show as dense triangle-rich cliques
  * or as hub/authority outliers; "frequently bought/linked together"
  * projections are ranked by exactly these scores).
  *
  * Triangles use the degree-ordered orientation of Suri &
  * Vassilvitskii (WWW'11, "Counting triangles and the curse of the
  * last reducer"): orient every undirected edge from the
  * lexicographically smaller (degree, id) endpoint to the larger, so
  * each node's out-degree is O(√m) and the wedge join never explodes
  * on hubs — the property that keeps the shuffle bounded at 100 TB
  * where a naive neighbor self-join on a power-law graph dies on its
  * highest-degree node.
  *
  * HITS follows the same all-integer fixed-point discipline as
  * [[PageRank]] (Kleinberg, JACM'99 for the semantics): raw scores are
  * long sums (associative, so bit-identical under any partitioning),
  * and the per-round max-normalization is an exact
  * decimal(38,0)-widened multiply-then-floor-divide that a SQL engine
  * chaining the same CTEs reproduces bit-for-bit. The textbook
  * L2-normalized float iteration would hash-flake across engines.
  */
object Graph {

  /** Canonical undirected edge relation: distinct (a < b) pairs,
    * self-loops and null endpoints dropped. */
  def undirected(edges: DataFrame): DataFrame =
    edges.select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .where(col("a").isNotNull && col("b").isNotNull &&
        col("a") =!= col("b"))
      .distinct()

  /** (v, deg) over the canonical undirected relation. */
  def degrees(und: DataFrame): DataFrame =
    und.select(col("a").as("v"))
      .unionByName(und.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))

  /** Per-node triangle participation and local clustering coefficient:
    * (v, deg, tri, coef_ppm) with coef_ppm =
    * ⌊2·10⁶·tri / (deg·(deg−1))⌋ (0 for deg < 2) — parts-per-million
    * fixed point so the ratio is integer-exact across engines.
    *
    * Shape: one wedge self-join on the oriented out-lists (out-degree
    * ≤ O(√m) by the orientation) + one equality join back against the
    * oriented edges to close each wedge + one explode/groupBy for the
    * per-node rollup. Nothing driver-side; every join is on narrow
    * integer keys. Overflow bound: 2·10⁶·tri must stay below 2⁶³ —
    * safe to ~4.6e12 triangles per node.
    */
  def triangles(edges: DataFrame): DataFrame = {
    val und = undirected(edges).localCheckpoint()
    val deg = degrees(und).localCheckpoint()
    val withDeg = und
      .join(deg.select(col("v").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("deg").as("db")), "b")
    // orient each edge from the smaller (deg, id) endpoint; carry the
    // head's (deg, id) so the wedge join can order its two heads
    val fwd = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val o = withDeg.select(
        when(fwd, col("a")).otherwise(col("b")).as("u"),
        when(fwd, col("b")).otherwise(col("a")).as("w"),
        when(fwd, col("db")).otherwise(col("da")).as("dw"))
      .localCheckpoint()
    // wedges u→{w1, w2} with (dw1, w1) < (dw2, w2): exactly the order
    // the w1–w2 edge would be oriented, so the closing join below is a
    // plain equality on (t1, t2) and each triangle is found exactly once
    val x = o.select(col("u"), col("w").as("t1"), col("dw").as("d1"))
    val y = o.select(col("u"), col("w").as("t2"), col("dw").as("d2"))
    val wedges = x.join(y, Seq("u"))
      .where(col("d1") < col("d2") ||
        (col("d1") === col("d2") && col("t1") < col("t2")))
      .select(col("u").as("t0"), col("t1"), col("t2"))
    val tris = wedges.join(
      o.select(col("u").as("t1"), col("w").as("t2")), Seq("t1", "t2"))
    val perNode = tris
      .select(explode(array(col("t0"), col("t1"), col("t2"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("tri"))
    deg.join(perNode, Seq("v"), "left")
      .withColumn("tri", coalesce(col("tri"), lit(0L)))
      .withColumn("coef_ppm",
        when(col("deg") >= 2,
          expr("(2000000L * tri) div (deg * (deg - 1))"))
          .otherwise(lit(0L)))
      .select("v", "deg", "tri", "coef_ppm")
  }

  /** HITS hubs/authorities after `iters` mutual-reinforcement rounds
    * over the distinct directed edge relation: (v, kind, score) with
    * kind ∈ {hub, auth}, scores max-normalized to `scale` each round.
    *
    * Per round: a'(v) = Σ_{u→v} h(u), a(v) = ⌊a'(v)·scale / max a'⌋
    * (decimal(38,0)-widened so the multiply is exact), then the
    * symmetric hub update from the fresh authority scores. Each round
    * is two narrow joins + two map-side-combined sums + two 1-row
    * scalar broadcasts; `localCheckpoint` truncates the iteration
    * lineage as [[PageRank.rankKeyed]] does. */
  def hits(edges: DataFrame, iters: Int,
           scale: Long = 1000000000L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(scale >= 100, s"scale too small: $scale")
    // NOTE (round 15, negative result): two pre-partitioned edge copies
    // (by src and by dst) were tried to remove the alternating
    // half-iteration exchanges — under AQE, localCheckpoint does not
    // preserve physical output partitioning, so both copies re-exchanged
    // anyway (warm 3.48 → 4.59 s). Reverted.
    val e = edges.select(col("src"), col("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct().localCheckpoint()
    val hubs = e.select(col("src").as("v")).distinct()
    var h = hubs.withColumn("h", lit(scale)).localCheckpoint()
    var a: DataFrame = null
    // the crossJoin(broadcast(max)) stays ONE action on purpose
    // (round-14 A/B): `raw` feeds both the broadcast subtree and the
    // main input, so the single checkpoint action computes the
    // aggregation shuffle once (ReusedExchange) with stage overlap —
    // a split checkpoint-then-collect-max form measured SLOWER
    // (3.0 → 4.5 s on graph_hits) from the extra synchronous action
    // per half-iteration
    def rescale(raw: DataFrame, out: String): DataFrame = {
      val mx = raw.agg(max(col("raw")).as("mx"))
      raw.crossJoin(broadcast(mx))
        .select(col("v"), expr(
          s"CAST((CAST(raw AS DECIMAL(38,0)) * ${scale}L) div mx AS BIGINT)")
          .as(out))
        .localCheckpoint()
    }
    for (_ <- 1 to iters) {
      val araw = e.join(h.select(col("v").as("src"), col("h")), "src")
        .groupBy(col("dst").as("v")).agg(sum(col("h")).as("raw"))
      a = rescale(araw, "a")
      val hraw = e.join(a.select(col("v").as("dst"), col("a")), "dst")
        .groupBy(col("src").as("v")).agg(sum(col("a")).as("raw"))
      h = rescale(hraw, "h")
    }
    h.select(col("v"), lit("hub").as("kind"), col("h").as("score"))
      .unionByName(
        a.select(col("v"), lit("auth").as("kind"), col("a").as("score")))
  }

  /** Semi-supervised label propagation (Zhu & Ghahramani 2002 shape,
    * made deterministic): seed labels are CLAMPED (authoritative —
    * they never change), and each synchronous round relabels every
    * non-seed node with the majority label among its currently-labeled
    * neighbors, ties broken by the SMALLEST label so the result is a
    * pure function of the graph — the quality/topic-label spreading
    * step web curation runs over link graphs (label a few thousand
    * audited hosts, propagate to the crawl).
    *
    * Per round: one edge⋈label join + one (v, lbl) count + one
    * window-rank over the count relation (bounded by labeled-neighbor
    * pairs, never the corpus) — the same shuffle shape each round, and
    * the whole chain is reproducible as SQL CTEs for the oracle.
    * Nodes that never see a labeled neighbor stay unlabeled (absent).
    *
    * @param seeds (v, lbl) relation; lbl any orderable type. */
  def labelProp(edges: DataFrame, seeds: DataFrame,
                iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    import org.apache.spark.sql.expressions.Window
    val und = undirected(edges).localCheckpoint()
    val sym = und.select(col("a").as("u"), col("b").as("w"))
      .unionByName(und.select(col("b").as("u"), col("a").as("w")))
      .localCheckpoint()
    val seed = seeds.select(col("v"), col("lbl")).localCheckpoint()
    var labels = seed
    for (_ <- 1 to iters) {
      val counts = sym
        .join(labels.select(col("v").as("u"), col("lbl")), "u")
        .groupBy(col("w").as("v"), col("lbl"))
        .agg(count(lit(1)).as("cnt"))
      val picked = counts.withColumn("rnk",
          row_number().over(Window.partitionBy("v")
            .orderBy(col("cnt").desc, col("lbl").asc)))
        .where(col("rnk") === 1).select("v", "lbl")
      labels = seed.unionByName(
          picked.join(seed.select(col("v")), Seq("v"), "left_anti"))
        .localCheckpoint()
    }
    labels
  }

  /** Bounded k-core peeling: `rounds` synchronous rounds of deleting
    * every node whose CURRENT degree is below `k` (with its edges).
    * Returns the survivors with their residual degree. For `rounds` ≥
    * the peel depth this is exactly the k-core — the dense-subgraph
    * signal (spam farms, botnet link rings survive; organic periphery
    * peels away); with a fixed `rounds` the semantics stay a pure
    * function of the input, reproducible round by round in SQL.
    *
    * Per round: one degree count + one semi-join edge restriction —
    * edge-relation-sized shuffles, nothing driver-side. */
  def kcorePeel(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    var und = undirected(edges).localCheckpoint()
    for (_ <- 1 to rounds) {
      // `keep` is NOT checkpointed: its two semi-join uses are identical
      // subtrees inside the one und-checkpoint action, so the degree
      // aggregation's exchange computes once and is reused
      // (ReusedExchange) — dropping the checkpoint removes one
      // synchronous job per round (round-15: jobs 24 → 15,
      // 2.0 → 1.3 s warm)
      val keep = degrees(und).where(col("deg") >= k)
        .select(col("v"))
      und = und
        .join(keep.select(col("v").as("a")), Seq("a"), "left_semi")
        .join(keep.select(col("v").as("b")), Seq("b"), "left_semi")
        .select("a", "b").localCheckpoint()
    }
    degrees(und)
  }

  /** Co-occurrence projection of a bipartite (basket, item) relation —
    * the market-basket / co-engagement graph builder: items are linked
    * by the number of baskets (orders, sessions, users, documents)
    * containing BOTH. The output edge list feeds [[triangles]],
    * [[labelProp]] or a retrieval negative-miner directly.
    *
    * Scale guard: a basket of w items emits w·(w−1)/2 pairs, so one
    * degenerate hub (a crawler session touching everything) makes the
    * join quadratic. Baskets larger than `maxBasketSize` are DROPPED
    * ENTIRELY (standard market-basket practice — an item list that
    * long carries no pairwise signal), which bounds the pair relation
    * by |baskets|·w²/2 and the join skew by w. The basket-size filter,
    * the self-join and the pair count all shuffle on basket/item keys
    * with map-side combine; nothing is driver-side.
    *
    * Output: (item_a, item_b, n_baskets) with item_a < item_b and
    * n_baskets ≥ `minCount`. */
  def coOccurrence(df: DataFrame, basketCol: String, itemCol: String,
                   minCount: Long, maxBasketSize: Long): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val kept = keptItems(df, basketCol, itemCol, maxBasketSize)
    pairCounts(kept, minCount)
  }

  /** Distinct (basket, item) rows of baskets within the hub guard.
    *
    * ONE basket-keyed exchange serves the whole basket family: the
    * up-front data-sized repartition
    * ([[graft.functions.PlanShape.dataSizedParts]]) clusters by
    * basket, which SATISFIES every downstream requirement — the
    * (basket, item) distinct (subset partitioning), the basket-size
    * groupBy, the hub-guard semi-join, and [[pairCounts]]'s self-join
    * — so none of them plans its own corpus-sized exchange (10M-item
    * probe: co-occurrence 30.3 → 15.0 s, association rules
    * 66.1 → 10.1 s). */
  private def keptItems(df: DataFrame, basketCol: String,
                        itemCol: String, maxBasketSize: Long): DataFrame = {
    require(maxBasketSize >= 2,
      s"maxBasketSize must be >= 2, got $maxBasketSize")
    val cleaned = df
      .select(col(basketCol).as("basket"), col(itemCol).as("item"))
      .where(col("basket").isNotNull && col("item").isNotNull)
    val bi = cleaned
      .repartition(graft.functions.PlanShape.dataSizedParts(cleaned),
        col("basket"))
      .distinct()
    val small = bi.groupBy("basket").agg(count(lit(1)).as("bsize"))
      .where(col("bsize") <= maxBasketSize)
      .select("basket")
    bi.join(small, Seq("basket"), "left_semi")
  }

  private def pairCounts(kept: DataFrame, minCount: Long): DataFrame =
    kept.select(col("basket"), col("item").as("item_a"))
      .join(kept.select(col("basket"), col("item").as("item_b")),
        Seq("basket"))
      .where(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b").agg(count(lit(1)).as("n_baskets"))
      .where(col("n_baskets") >= minCount)

  /** Additive merge of two [[coOccurrence]] outputs — baskets arrive
    * WHOLE (an order, a session), so a daily ingest mines only its new
    * baskets and folds the pair counts into the persisted relation;
    * re-apply the support floor after merging (a pair can cross
    * `minCount` only when counts combine). */
  def mergeCoOccurrence(a: DataFrame, b: DataFrame,
                        minCount: Long): DataFrame =
    a.unionByName(b).groupBy("item_a", "item_b")
      .agg(sum(col("n_baskets")).as("n_baskets"))
      .where(col("n_baskets") >= minCount)

  /** Single-item association rules over the co-occurrence relation
    * (Agrawal & Srikant 1994 reduced to the pairwise case): for every
    * surviving pair, BOTH directed rules antecedent ⇒ consequent with
    *
    *   confidence = n_ab / n_ant        (floor ×10⁶)
    *   lift       = n_ab·N / (n_ant·n_cons)  (floor ×10⁶)
    *
    * — all-integer floor division, engine-exact. Supports and N count
    * the baskets SURVIVING the hub guard, so the scores and the pair
    * counts describe the same population. Overflow bound: n_ab·N·10⁶
    * must stay below 2⁶³ (N ≤ ~3e9 baskets with thousand-strong
    * pairs; beyond that, mine per-partition and merge).
    *
    * Output: (antecedent, consequent, n_ab, n_ant, n_cons, conf_x1e6,
    * lift_x1e6); lift > 1e6 means the pair co-occurs more than
    * independence predicts. Scale shape: [[coOccurrence]]'s bounded
    * joins plus one item-domain support aggregate and a 1-row basket
    * count broadcast. */
  def associationRules(df: DataFrame, basketCol: String, itemCol: String,
                       minCount: Long, maxBasketSize: Long): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val kept = keptItems(df, basketCol, itemCol, maxBasketSize)
      .localCheckpoint()
    val pairs = pairCounts(kept, minCount)
    val supp = kept.groupBy("item").agg(count(lit(1)).as("n_item"))
    val total = kept.select(countDistinct(col("basket")).as("n_total"))
    val directed = pairs.select(col("item_a").as("antecedent"),
        col("item_b").as("consequent"), col("n_baskets").as("n_ab"))
      .unionByName(pairs.select(col("item_b").as("antecedent"),
        col("item_a").as("consequent"), col("n_baskets").as("n_ab")))
    directed
      .join(supp.select(col("item").as("antecedent"),
        col("n_item").as("n_ant")), Seq("antecedent"))
      .join(supp.select(col("item").as("consequent"),
        col("n_item").as("n_cons")), Seq("consequent"))
      .crossJoin(broadcast(total))
      .select(col("antecedent"), col("consequent"), col("n_ab"),
        col("n_ant"), col("n_cons"),
        expr("n_ab * 1000000L div n_ant").as("conf_x1e6"),
        expr("n_ab * n_total * 1000000L div (n_ant * n_cons)")
          .as("lift_x1e6"))
  }
}
