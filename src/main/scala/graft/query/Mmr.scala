package graft.query

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Maximal-marginal-relevance reranking (Carbonell & Goldstein 1998) —
  * the diversity pass between retrieval and the user: greedily pick
  * the candidate maximizing
  *
  *   score = λ·rel − (1−λ)·max_{s ∈ selected} sim(c, s)
  *
  * so near-duplicates of an already-selected result rank below a
  * fresh-but-slightly-less-relevant one. The de-facto rerank for RAG
  * context assembly and SERP diversification.
  *
  * Everything is INTEGER arithmetic: λ is parts-per-million,
  * relevance and similarity are caller-provided longs on a common
  * scale (tf scores and shared-token counts, fixed-point cosines ×1e6,
  * …), ties break to the smaller candidate id — so the greedy walk is
  * bit-reproducible in any engine (the oracle unrolls the same rounds
  * as CTEs).
  *
  * Scale shape: candidates arrive PRE-BOUNDED per query (a top-N from
  * [[TextSearch]] / [[ExactKnn]] / [[graft.query.AnnQuery]]), so each
  * group is ≤ N rows + ≤ N² similarity edges; the greedy loop runs
  * inside `flatMapGroups` with that bounded state — thousands of
  * queries rerank in parallel, nothing is driver-side, and the only
  * shuffle is the query-keyed group-by. */
object Mmr {

  /** @param cands (qid, cid, rel) — bounded candidate set per query;
    *              candidate ids must be UNIQUE within a query (a
    *              retrieval top-N is; duplicate cids would silently
    *              keep one relevance value)
    * @param sims  (qid, a, b, sim) — pairwise similarities among a
    *              query's candidates (either orientation; missing
    *              pairs count as 0)
    * @param k     results to keep per query
    * @param lambdaX1e6 relevance weight λ in ppm (1e6 = pure
    *              relevance, 0 = pure diversity)
    * @return (qid, rank, cid, score) — rank 1..k in pick order */
  def rerank(cands: DataFrame, sims: DataFrame, k: Int,
             lambdaX1e6: Long): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(lambdaX1e6 >= 0 && lambdaX1e6 <= 1000000L,
      s"lambdaX1e6 must be in [0, 1e6], got $lambdaX1e6")
    val spark = cands.sparkSession
    import spark.implicits._
    val mu = 1000000L - lambdaX1e6
    val cl = cands.groupBy(col("qid"))
      .agg(collect_list(struct(col("cid"), col("rel"))).as("cs"))
    val sl = sims.groupBy(col("qid"))
      .agg(collect_list(struct(col("a"), col("b"), col("sim")))
        .as("ss"))
    cl.join(sl, Seq("qid"), "left")
      .as[(Long, Seq[(Long, Long)], Option[Seq[(Long, Long, Long)]])]
      .flatMap { case (qid, cs, ssOpt) =>
        val sim = scala.collection.mutable.Map.empty[(Long, Long), Long]
        ssOpt.getOrElse(Nil).foreach { case (a, b, s) =>
          sim((a, b)) = s; sim((b, a)) = s
        }
        val remaining = scala.collection.mutable.Set(cs.map(_._1): _*)
        val rel = cs.toMap
        val selected = scala.collection.mutable.ArrayBuffer.empty[Long]
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Long, Long, Long)]
        var rank = 1L
        while (rank <= k && remaining.nonEmpty) {
          val best = remaining.map { c =>
            val penalty =
              if (selected.isEmpty) 0L
              else selected.map(s => sim.getOrElse((c, s), 0L)).max
            (lambdaX1e6 * rel(c) - mu * penalty, c)
          }.maxBy { case (score, c) => (score, -c) }
          out += ((qid, rank, best._2, best._1))
          selected += best._2
          remaining -= best._2
          rank += 1
        }
        out
      }(Encoders.product[(Long, Long, Long, Long)])
      .toDF("qid", "rank", "cid", "score")
  }
}
