package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ContrastiveSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // anchor 1's neighbors in rank order: 1 (self), 2 (positive), 3, 4, 5
  // anchor 2's: 9 (positive), 11, 2 (self)
  private lazy val knn = Seq(
    (1L, 1L, 1L), (1L, 2L, 2L), (1L, 3L, 3L), (1L, 4L, 4L), (1L, 5L, 5L),
    (2L, 9L, 1L), (2L, 11L, 2L), (2L, 2L, 3L)
  ).toDF("qid", "doc_id", "rank")
  private lazy val positives = Seq((1L, 2L), (2L, 9L)).toDF("qid", "doc_id")

  test("hardNegatives: drops self and positives, re-ranks densely") {
    val r = Contrastive.hardNegatives(knn, positives, k = 2).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).sorted
    // anchor 1: 3 and 4 survive at ranks 1, 2 (5 cut by k)
    // anchor 2: self and positive drop; 11 survives at rank 1
    assert(r.toSeq === Seq((1L, 3L, 1L), (1L, 4L, 2L), (2L, 11L, 1L)))
  }

  test("hardNegatives: anchor with only self/positives yields no rows") {
    val onlySelf = Seq((7L, 7L, 1L), (7L, 8L, 2L)).toDF("qid", "doc_id", "rank")
    val pos = Seq((7L, 8L)).toDF("qid", "doc_id")
    assert(Contrastive.hardNegatives(onlySelf, pos, 3).count() === 0L)
  }

  test("triplets: every positive crossed with top-n negatives") {
    val negs = Contrastive.hardNegatives(knn, positives, k = 2)
    val t = Contrastive.triplets(positives, negs, negativesPerPair = 2)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).sorted
    assert(t.toSeq === Seq((1L, 2L, 3L), (1L, 2L, 4L), (2L, 9L, 11L)))
  }
}
