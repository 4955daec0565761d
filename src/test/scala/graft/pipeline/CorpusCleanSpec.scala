package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Stage order and reason uniqueness of the corpus-cleaning composite:
  * quality drops happen first (and shield those docs from dedup), exact
  * dups keep the min id, near-dup clusters keep their min id. */
class CorpusCleanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val longText =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
  // near-dup of longText: one token of 20 swapped → J = 19/21 ≈ 0.905
  private val nearText =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau phi"

  private def docs = Seq(
    (0L, longText),            // keeper (min id of its near-dup cluster)
    (1L, longText),            // exact dup of 0 → exact_dup
    (2L, nearText),            // near-dup of 0 at J ≈ 0.905 → near_dup
    (3L, "too short"),         // 2 tokens → quality
    (4L, "the a an of to and the a an of to and the a an of"),
                               // 100% stopwords → quality
    (5L, "completely different content about unrelated matters entirely " +
      "with plenty of additional words to clear the token threshold easily"),
  ).toDF("doc_id", "text")

  test("drop decisions: one reason per doc, stage order respected") {
    val got = CorpusClean.dropDecisions(docs, minTokens = 5, maxStopPct = 60,
        dedupThresholdPct = 90)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "exact_dup", 2L -> "near_dup",
      3L -> "quality", 4L -> "quality"))
  }

  test("cleaned: survivors only") {
    val kept = CorpusClean.cleaned(docs, 5, 60, 90)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(0L, 5L))
  }

  test("a quality-dropped exact dup is billed to quality, not dedup") {
    val d = Seq((10L, "tiny text"), (11L, "tiny text")).toDF("doc_id", "text")
    val got = CorpusClean.dropDecisions(d, minTokens = 5, maxStopPct = 60,
        dedupThresholdPct = 90)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // both fail the token minimum; neither survives into the dedup stages
    assert(got === Map(10L -> "quality", 11L -> "quality"))
  }
}
