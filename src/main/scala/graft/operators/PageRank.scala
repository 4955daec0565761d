package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph centrality by bounded power iteration — the host/document
  * ranking signal web-corpus curation uses for quality weighting
  * (Common Crawl publishes harmonic/PageRank host centralities, and
  * quality-filter pipelines consume them as priors; a near-dup pair
  * graph ranks "canonical-ness" the same way). Also the
  * connected-components companion: CC answers "which cluster", this
  * answers "how central inside the link structure".
  *
  * ALL-INTEGER fixed-point arithmetic (scores scaled by `scale`,
  * per-edge contribution floor(s/deg), damping applied via the exact
  * split-multiply identity) — long sums are associative, so the result
  * is bit-identical however Spark parallelizes the aggregation, and a
  * SQL engine chaining the same per-iteration CTEs reproduces it
  * exactly. The textbook float formulation would hash-flake: double
  * addition is order-dependent under parallel aggregation.
  *
  * Semantics: s₀(v) = scale for every node;
  * sₜ₊₁(v) = ⌊scale·(100−damp)/100⌋ + ⌊damp·Σ_{u→v}⌊sₜ(u)/deg(u)⌋/100⌋.
  * Dangling mass (nodes without out-edges) is dropped — the simple
  * power-iteration variant; ranks are relative weights, not a
  * probability distribution.
  *
  * Scale shape: each iteration is one fixed-width (src, dst, deg, s)
  * join + a map-side-combined sum per destination — never the node
  * payload, never a collect; `localCheckpoint` truncates the iteration
  * lineage exactly as [[graft.pipeline.Dedup.connectedComponents]]
  * does. `iters` is a small constant (centrality signals converge in a
  * handful of rounds at damping 0.85).
  */
object PageRank {

  /** (v, s) fixed-point centrality after `iters` rounds over the
    * DISTINCT (src, dst) edge relation. Overflow bound: Σ contributions
    * ≤ n_nodes·scale, so keep n_nodes·scale below ~9e18 (the default
    * 1e9 scale is safe to ~9e9 nodes). */
  def rankInt(edges: DataFrame, iters: Int, dampX100: Int = 85,
              scale: Long = 1000000000L): DataFrame =
    rankKeyed(edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")), iters, dampX100, scale)

  /** Personalized PageRank: identical fixed-point iteration, but the
    * teleport mass ⌊scale·(100−damp)/100⌋ lands ONLY on the `seeds`
    * relation's nodes (everyone else's base term is 0), so rank flows
    * outward from a trusted set — the crawl-frontier / TrustRank-style
    * scorer (bias centrality toward audited hosts; spam that no seed
    * reaches scores 0). Seeds also start at `scale`, non-seeds at 0.
    * Same all-integer arithmetic, same per-iteration CTE oracle shape
    * with the base term gated by a seed join. */
  def rankPersonalized(edges: DataFrame, seeds: DataFrame, iters: Int,
                       dampX100: Int = 85,
                       scale: Long = 1000000000L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(dampX100 >= 0 && dampX100 <= 100,
      s"dampX100 must be in 0..100, got $dampX100")
    require(scale >= 100, s"scale too small: $scale")
    val e = edges.select(col("src"), col("dst"))
      .distinct().localCheckpoint()
    // loop-invariant edge⋈degree fold — the rankKeyed rationale
    val ed = e
      .join(e.groupBy("src").agg(count(lit(1)).as("deg")), "src")
      .localCheckpoint()
    val seed = seeds.select(col("v")).distinct().localCheckpoint()
    val nodes = e.select(col("src").as("v"))
      .unionByName(e.select(col("dst").as("v")))
      .unionByName(seed)
      .distinct()
      .join(seed.withColumn("is_seed", lit(1L)), Seq("v"), "left")
      .select(col("v"), coalesce(col("is_seed"), lit(0L)).as("is_seed"))
      .localCheckpoint()
    val base = scale * (100 - dampX100) / 100
    var s = nodes.select(col("v"),
      (col("is_seed") * scale).as("s"))
    for (_ <- 1 to iters) {
      val contrib = ed
        .join(s.select(col("v").as("src"), col("s")), "src")
        .select(col("dst").as("v"), expr("s div deg").as("c"))
        .groupBy("v").agg(sum(col("c")).as("contrib"))
      s = nodes.join(contrib, Seq("v"), "left")
        .select(col("v"),
          (col("is_seed") * base + coalesce(
            expr(s"$dampX100 * (contrib div 100) + " +
              s"($dampX100 * (contrib % 100)) div 100"),
            lit(0L))).as("s"))
        .localCheckpoint()
    }
    s
  }

  /** [[rankInt]] over ARBITRARY node keys (hosts, URLs, doc hashes) —
    * the iteration only ever equality-joins and groups on the key, so
    * nothing requires integer ids; identical arithmetic, identical
    * oracle CTE chain. */
  def rankKeyed(edges: DataFrame, iters: Int, dampX100: Int = 85,
                scale: Long = 1000000000L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(dampX100 >= 0 && dampX100 <= 100,
      s"dampX100 must be in 0..100, got $dampX100")
    require(scale >= 100, s"scale too small: $scale")
    // NOTE (round 15, negative result): pre-partitioning e/deg/nodes on
    // their join keys before the checkpoint was tried to remove the
    // per-iteration src-side exchange — under AQE, localCheckpoint does
    // NOT preserve physical output partitioning (probed: a groupBy over
    // a src-repartitioned checkpoint re-exchanges), so the extra
    // repartitions were pure cost (warm 2.96 → 4.65 s). Reverted.
    val e = edges.select(col("src"), col("dst"))
      .distinct().localCheckpoint()
    // the edge⋈degree join is LOOP-INVARIANT: fold it once into a
    // (src, dst, deg) relation instead of re-joining deg inside every
    // iteration — one join + its exchanges per round removed (guide
    // §1.2: don't recompute what doesn't change)
    val ed = e
      .join(e.groupBy("src").agg(count(lit(1)).as("deg")), "src")
      .localCheckpoint()
    val nodes = e.select(col("src").as("v"))
      .unionByName(e.select(col("dst").as("v")))
      .distinct().localCheckpoint()
    val base = scale * (100 - dampX100) / 100
    var s = nodes.withColumn("s", lit(scale))
    for (_ <- 1 to iters) {
      val contrib = ed
        .join(s.select(col("v").as("src"), col("s")), "src")
        .select(col("dst").as("v"), expr("s div deg").as("c"))
        .groupBy("v").agg(sum(col("c")).as("contrib"))
      // (damp·contrib) div 100 via the exact split-multiply identity —
      // damp·(c div 100) + (damp·(c mod 100)) div 100 — so the product
      // never exceeds damp·contrib/100 ~ contrib in magnitude
      s = nodes.join(contrib, Seq("v"), "left")
        .select(col("v"),
          (lit(base) + coalesce(
            expr(s"$dampX100 * (contrib div 100) + " +
              s"($dampX100 * (contrib % 100)) div 100"),
            lit(0L))).as("s"))
        .localCheckpoint()
    }
    s
  }
}
