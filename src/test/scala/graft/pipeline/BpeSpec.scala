package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Bpe: trainable merges + one-projection encoding. The load-bearing
  * claims: training reproduces by-hand BPE (greedy left-to-right merge
  * application, (count desc, left, right) tie-break), the replace-chain
  * encoding equals a by-hand reference application — including the
  * overlap case — and merges never cross token boundaries. */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** By-hand BPE application of `merges` (in order) to one token. */
  private def applyByHand(tok: String, merges: Seq[(String, String)]): Seq[String] = {
    var syms: Seq[String] = tok.map(_.toString)
    for ((l, r) <- merges) {
      val out = Seq.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
          out += (l + r); i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.result()
    }
    syms
  }

  private def symbols(encoded: String): Seq[String] =
    encoded.trim.split("  ").toSeq

  test("training recovers the classic hand-worked merges") {
    // "low" x5, "lower" x2, "newest" x6, "widest" x3 — the Sennrich
    // worked example. Pair counts: (e,s)=9, (s,t)=9, (l,o)=7, (o,w)=7 …
    // tie-break (count desc, left, right): (e,s) before (s,t).
    val docs = (
      Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val model = Bpe.fit(docs, "text", nMerges = 4)
    assert(model.merges === Seq(("e", "s"), ("es", "t"), ("l", "o"),
      ("lo", "w")))
  }

  test("encoding equals by-hand BPE application per token; boundary " +
      "sentinels never participate in merges") {
    val docs = Seq(
      (1L, "low lower newest"), (2L, "widest low"), (3L, "newest newest"))
      .toDF("doc_id", "text")
    val model = Bpe.fit(docs, "text", nMerges = 6)
    val got = Bpe.encode(docs, "text", "doc_id", model)
      .orderBy("doc_id").collect()
    val texts = docs.orderBy("doc_id").collect().map(_.getString(1))
    got.zip(texts).foreach { case (row, text) =>
      val expect = text.split(" ").toSeq
        .map(applyByHand(_, model.merges))
        .reduce((a, b) => a ++ Seq(Bpe.boundary) ++ b)
      assert(symbols(row.getString(2)) === expect,
        s"doc ${row.getLong(0)}")
      assert(row.getLong(1) === expect.count(_ != Bpe.boundary))
    }
  }

  test("overlap case: the replace-chain greedy scan matches by-hand " +
      "(aaaa -> [aa, aa], aaa -> [aa, a])") {
    val docs = Seq((1L, "aaaa aaa aaaaa")).toDF("doc_id", "text")
    val model = Bpe.BpeModel(Seq(("a", "a")))
    val enc = Bpe.encode(docs, "text", "doc_id", model).head()
    assert(symbols(enc.getString(2)) === Seq(
      "aa", "aa", Bpe.boundary, "aa", "a", Bpe.boundary, "aa", "aa", "a"))
    assert(enc.getLong(1) === 7L)
  }

  test("unicode pre-tokenization: letters+marks, digit runs, single " +
      "symbols; punctuation splits off") {
    val got = Seq((1L, "Héllo, wörld 42 ok—bye"))
      .toDF("doc_id", "text")
      .select(explode(Bpe.pretokens(col("text"))).as("t"))
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq("Héllo", ",", "wörld", "42", "ok", "—", "bye"))
  }

  test("maxWords cap keeps the highest-count words; training still runs") {
    val docs = (Seq.fill(50)("aa") ++ Seq.fill(2)("zz"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val model = Bpe.train(Bpe.wordCounts(docs, "text"), nMerges = 1,
      maxWords = 1)
    assert(model.merges === Seq(("a", "a"))) // zz fell outside the cap
  }

  test("empty text and no-pair vocabularies are handled, not crashed") {
    val docs = Seq((1L, ""), (2L, "a b c")).toDF("doc_id", "text")
    val model = Bpe.fit(docs, "text", nMerges = 5) // single-char words: no pairs
    assert(model.merges.isEmpty)
    val got = Bpe.encode(docs, "text", "doc_id", model)
      .orderBy("doc_id").collect()
    assert(got(0).getLong(1) === 0L)
    assert(got(1).getLong(1) === 3L)
  }

  test("training is deterministic under repartitioning") {
    val docs = (0 until 200)
      .map(i => (i.toLong, s"token$i repeated tok en${i % 7}"))
      .toDF("doc_id", "text")
    val a = Bpe.fit(docs.repartition(3), "text", 10).merges
    val b = Bpe.fit(docs.repartition(17), "text", 10).merges
    assert(a === b)
  }
}
