package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TrainingDataSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = (0L until 1000L)
    .map(i => (i, Seq.fill((i % 37 + 1).toInt)("tok").mkString(" "),
      s"src${i % 5}"))
    .toDF("doc_id", "text", "source")

  test("hashSplit: total cover, rough 80/10/10, pure function of id") {
    val r = TrainingData.hashSplit(docs, "doc_id")
    val counts = r.groupBy("split").count().collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(counts.values.sum === 1000L)
    assert(counts("train") > 700 && counts("train") < 900)
    assert(counts("val") > 50 && counts("val") < 180)
    assert(counts("test") > 50 && counts("test") < 180)
    // membership depends only on the id: a second run and a shuffled
    // input produce the identical assignment
    val again = TrainingData.hashSplit(docs.repartition(13), "doc_id")
      .select("doc_id", "split").collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    r.select("doc_id", "split").collect()
      .foreach(x => assert(again(x.getLong(0)) === x.getString(1)))
  }

  test("perGroupCap: cap respected, deterministic, subset of input") {
    val r = TrainingData.perGroupCap(docs, "source", "doc_id", cap = 30)
    val per = r.groupBy("source").count().collect().map(_.getLong(1))
    assert(per.forall(_ === 30L)) // every source has 200 docs, capped to 30
    val ids = r.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf((0L until 1000L).toSet))
    val again = TrainingData.perGroupCap(docs.repartition(7), "source",
      "doc_id", cap = 30).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again === ids)
  }

  test("packSequences matches a sequential reference layout") {
    val budget = 64
    val shards = 4
    val got = TrainingData.packSequences(docs, "doc_id",
        size(TextAnalysis.tokens(col("text"))), budget, shards)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // reference: per shard, docs in id order, running start offset
    val nTok = (0L until 1000L).map(i => i -> (i % 37 + 1)).toMap
    val expect = scala.collection.mutable.Map[Long, (Long, Long, Long)]()
    for (sh <- 0L until shards.toLong) {
      var cum = 0L
      for (id <- sh until 1000L by shards.toLong) {
        expect(id) = (sh, cum / budget, cum % budget)
        cum += nTok(id)
      }
    }
    assert(got.size === 1000)
    got.foreach { case (id, v) => assert(v === expect(id), s"doc $id") }
  }

  test("packSequences: offsets within budget and monotone within a sequence") {
    val r = TrainingData.packSequences(docs, "doc_id",
      size(TextAnalysis.tokens(col("text"))), budget = 128, shards = 2)
    assert(r.where(col("seq_offset") < 0 || col("seq_offset") >= 128).count() === 0)
    val bySeq = r.collect().groupBy(x => (x.getLong(1), x.getLong(2)))
    bySeq.values.foreach { rows =>
      val sorted = rows.sortBy(_.getLong(0)).map(_.getLong(3)).toSeq
      assert(sorted == sorted.sorted)
    }
  }
}
