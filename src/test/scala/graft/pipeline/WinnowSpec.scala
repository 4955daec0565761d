package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.FastFunctions

/** Winnowed fingerprinting (Schleimer–Wilkerson–Aiken SIGMOD'03) vs
  * brute-force window-string oracles: the selection guarantee (any
  * shared (n+w−1)-token substring yields the pair), verified-output
  * exactness, sampling density, and the maxDf skew cap. */
class WinnowSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val n = 4
  private val w = 5
  private val L = n + w - 1 // 8

  private def randTokens(seed: Int, len: Int): Array[String] = {
    val r = new scala.util.Random(seed)
    Array.fill(len)("t" + r.nextInt(100000))
  }

  /** All pairs sharing >= 1 exact L-token window, with the count of
    * distinct shared window STRINGS — the measure winnowedPairs verifies
    * against. */
  private def brutePairs(corpus: Seq[(Long, String)]): Set[(Long, Long, Long)] = {
    val wins = corpus.map { case (id, t) =>
      id -> t.split(" ").sliding(L).filter(_.length == L)
        .map(_.mkString(" ")).toSet
    }
    (for {
      (a, wa) <- wins; (b, wb) <- wins if a < b
      inter = wa.intersect(wb).size if inter > 0
    } yield (a, b, inter.toLong)).toSet
  }

  private def result(df: DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("winnowedPairs equals the brute-force shared-L-window relation " +
      "on a corpus with planted overlaps at different offsets") {
    val shared = randTokens(7, L).mkString(" ")   // exactly L tokens
    val longer = randTokens(8, 2 * L).mkString(" ") // a 2L-token overlap
    val corpus = Seq(
      (1L, (randTokens(1, 40) :+ shared).mkString(" ") + " " +
        randTokens(2, 10).mkString(" ")),
      (2L, shared + " " + randTokens(3, 60).mkString(" ")),
      (3L, randTokens(4, 25).mkString(" ") + " " + longer),
      (4L, longer + " " + randTokens(5, 35).mkString(" ")),
      (5L, randTokens(6, 50).mkString(" ")),
      (6L, "tiny doc"))
    val docs = corpus.toDF("doc_id", "text")
    val out = result(Dedup.winnowedPairs(docs, n, w))
    val oracle = brutePairs(corpus)
    assert(out === oracle)
    // the planted pairs are actually in there (the test tests something)
    assert(out.exists(p => p._1 == 1L && p._2 == 2L))
    assert(out.exists(p => p._1 == 3L && p._2 == 4L))
  }

  test("guarantee holds across 30 random offset placements") {
    val shared = randTokens(99, L).mkString(" ")
    val corpus = (0 until 30).map { i =>
      val pre = randTokens(1000 + i, i % 17)
      val post = randTokens(2000 + i, 23)
      (i.toLong, (pre ++ Array(shared) ++ post).mkString(" ").trim)
    }
    val docs = corpus.toDF("doc_id", "text")
    val out = result(Dedup.winnowedPairs(docs, n, w))
    // every pair shares the planted substring -> all 30*29/2 pairs found
    assert(out.size === 30 * 29 / 2)
    assert(out === brutePairs(corpus))
  }

  test("no shared L-window means no pairs (verification removes " +
      "fingerprint coincidences)") {
    val corpus = Seq(
      (1L, randTokens(11, 80).mkString(" ")),
      (2L, randTokens(12, 80).mkString(" ")),
      (3L, randTokens(13, 80).mkString(" ")))
    assert(result(Dedup.winnowedPairs(corpus.toDF("doc_id", "text"), n, w))
      === Set.empty[(Long, Long, Long)])
  }

  test("fingerprints are a subset of the doc's gram hashes, non-empty " +
      "whenever >= 1 gram exists, empty below n tokens") {
    val docs = Seq(
      (1L, randTokens(21, 500).mkString(" ")), // long
      (2L, randTokens(22, n).mkString(" ")),   // exactly one gram
      (3L, randTokens(23, n + 2).mkString(" ")), // 3 grams < w
      (4L, randTokens(24, n - 1).mkString(" ")), // below n
      (5L, "")).toDF("doc_id", "text")
    val toks = split(col("text"), " ")
    val rows = docs.select(col("doc_id"),
      FastFunctions.winnowedFingerprints(toks, n, w).as("fp"),
      FastFunctions.shingleHashes(toks, n).as("all"))
      .collect()
    rows.foreach { r =>
      val fp = r.getSeq[Long](1).toSet
      val all = r.getSeq[Long](2).toSet
      assert(fp.subsetOf(all), s"doc ${r.getLong(0)}")
      if (all.nonEmpty) assert(fp.nonEmpty, s"doc ${r.getLong(0)}")
      else assert(fp.isEmpty, s"doc ${r.getLong(0)}")
    }
  }

  test("sampling density on random text is near 2/(w+1)") {
    val m = 20000 - n + 1
    val docs = Seq((1L, randTokens(31, 20000).mkString(" ")))
      .toDF("doc_id", "text")
    val cnt = docs.select(size(FastFunctions.winnowedFingerprints(
      split(col("text"), " "), n, w)).as("c")).head().getInt(0)
    val expected = 2.0 / (w + 1) * m
    assert(cnt > expected * 0.7 && cnt < expected * 1.3,
      s"density off: $cnt vs expected ~$expected")
  }

  test("winnowing is deterministic") {
    val docs = Seq((1L, randTokens(41, 300).mkString(" ")))
      .toDF("doc_id", "text")
    val c = split(col("text"), " ")
    val a = docs.select(FastFunctions.winnowedFingerprints(c, n, w))
      .head().getSeq[Long](0)
    val b = docs.select(FastFunctions.winnowedFingerprints(c, n, w))
      .head().getSeq[Long](0)
    assert(a === b)
  }

  test("winnowedPairsBipartite equals the symmetric relation restricted " +
      "to cross-split pairs and never emits within-side pairs") {
    val shared = randTokens(71, L).mkString(" ")
    val other = randTokens(72, L + 3).mkString(" ")
    val corpus = Seq(
      (1L, (randTokens(73, 20) :+ shared).mkString(" ")),   // corpus side
      (2L, shared + " " + randTokens(74, 15).mkString(" ")), // corpus side
      (3L, other + " " + randTokens(75, 30).mkString(" ")),  // corpus side
      (10L, randTokens(76, 12).mkString(" ") + " " + shared), // new side
      (11L, other),                                           // new side
      (12L, randTokens(77, 40).mkString(" ")))                // new, clean
    val docs = corpus.toDF("doc_id", "text")
    val newDocs = docs.where(col("doc_id") >= 10)
    val old = docs.where(col("doc_id") < 10)
    val out = result(Dedup.winnowedPairsBipartite(newDocs, old, n, w))
    // oracle: symmetric brute-force pairs, keep only new x corpus
    val oracle = brutePairs(corpus).collect {
      case (a, b, c) if a < 10 && b >= 10 => (b, a, c)
      case (a, b, c) if a >= 10 && b < 10 => (a, b, c)
    }
    assert(out === oracle)
    // the planted cross pairs exist; corpus x corpus (1,2) is absent
    assert(out.exists(p => p._1 == 10L && p._2 == 1L))
    assert(out.exists(p => p._1 == 10L && p._2 == 2L))
    assert(out.exists(p => p._1 == 11L && p._2 == 3L))
    assert(out.forall(p => p._1 >= 10L && p._2 < 10L))
  }

  test("winnowedPairsBipartite maxDf caps on CORPUS fingerprint df") {
    val boiler = randTokens(81, L).mkString(" ")
    val old = (1 to 5).map { i =>
      (i.toLong, randTokens(82 + i, 25).mkString(" ") + " " + boiler)
    }.toDF("doc_id", "text")
    val newDocs = Seq(
      (10L, boiler + " " + randTokens(90, 20).mkString(" ")))
      .toDF("doc_id", "text")
    val full = result(Dedup.winnowedPairsBipartite(newDocs, old, n, w))
    assert(full.size === 5)
    // the boilerplate fingerprint has corpus df 5 > 2 -> all capped away
    val capped = result(
      Dedup.winnowedPairsBipartite(newDocs, old, n, w, maxDf = Some(2)))
    assert(capped === Set.empty[(Long, Long, Long)])
  }

  test("maxDf drops ubiquitous-fingerprint candidates (boilerplate cap)") {
    val boiler = randTokens(51, L).mkString(" ")
    // every doc carries the boilerplate window; no other overlap
    val corpus = (1 to 6).map { i =>
      (i.toLong, randTokens(60 + i, 30).mkString(" ") + " " + boiler)
    }
    val docs = corpus.toDF("doc_id", "text")
    val full = result(Dedup.winnowedPairs(docs, n, w))
    assert(full.size === 6 * 5 / 2)
    // any fingerprint two docs share has df >= 2 > 1, so the cap drops
    // every cross-doc fingerprint and no candidate can survive
    val capped = result(Dedup.winnowedPairs(docs, n, w, maxDf = Some(1)))
    assert(capped === Set.empty[(Long, Long, Long)])
  }
}
