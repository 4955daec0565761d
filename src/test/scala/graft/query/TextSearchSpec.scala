package graft.query

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** TextSearch semantics: conjunctive tf search through both physical
  * paths (index-free scan, inverted-index postings) must agree; ranking
  * is (tf desc, id) with integer scores. */
class TextSearchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (0L, "spark vector spark table"),
    (1L, "vector vector row"),
    (2L, "spark spark spark"),
    (3L, "spark vector"),
    (4L, "other words entirely")).toDF("doc_id", "text")

  test("searchScan: conjunctive hits only, tf summed over terms") {
    val r = TextSearch.searchScan(docs, "doc_id", "text",
        Seq("spark", "vector"))
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(r === Seq((0L, 3L), (3L, 2L)))
  }

  test("postings path agrees with scan path") {
    val post = TextSearch.postings(docs, "doc_id", "text")
    val a = TextSearch.searchPostings(post, "doc_id", Seq("spark", "vector"))
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    val b = TextSearch.searchScan(docs, "doc_id", "text",
        Seq("spark", "vector"))
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("postings: unique per (token, doc) with the right tf") {
    val p = TextSearch.postings(docs, "doc_id", "text")
    assert(p.where($"tok" === "spark" && $"doc_id" === 2L)
      .select("tf").as[Long].head() === 3L)
    assert(p.groupBy("tok", "doc_id").count()
      .where($"count" > 1).count() === 0L)
  }

  test("rankedSearch: (tf desc, id) order, k bound, rank dense from 1") {
    val r = TextSearch.rankedSearch(docs, "doc_id", "text", Seq("spark"), 2)
      .as[(Long, Long, Long)].collect().toSeq
    assert(r === Seq((1L, 2L, 3L), (2L, 0L, 2L)))
  }

  test("bm25Scores equals an independent in-JVM BM25 computation") {
    val corpus = Seq(
      (0L, "spark vector spark table"),
      (1L, "vector vector row"),
      (2L, "spark spark spark"),
      (3L, "spark vector"),
      (4L, "other words entirely"))
    val terms = Seq("spark", "vector")
    val (k1, b) = (1.2, 0.75)
    val lens = corpus.map(_._2.split(" ").length.toDouble)
    val n = corpus.size.toDouble
    val avglen = lens.sum / n
    def tf(text: String, t: String) = text.split(" ").count(_ == t).toDouble
    val dfs = terms.map(t => corpus.count(c => tf(c._2, t) > 0).toDouble)
    val idfs = dfs.map(df => math.log(1.0 + (n - df + 0.5) / (df + 0.5)))
    val want = corpus.flatMap { case (id, text) =>
      val tfs = terms.map(tf(text, _))
      val dl = text.split(" ").length.toDouble
      val score = terms.indices.map { i =>
        idfs(i) * tfs(i) * (k1 + 1) /
          (tfs(i) + k1 * (1 - b + b * dl / avglen))
      }.sum
      val nm = tfs.count(_ > 0).toLong
      if (nm > 0)
        Some((id, nm, BigDecimal(score)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
      else None
    }
    val got = TextSearch.bm25Scores(docs, "doc_id", "text", terms)
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    assert(got === want)
    assert(got.map(_._1) === Seq(0L, 1L, 2L, 3L)) // doc 4 matches nothing
  }

  test("duplicate query terms collapse to single-term semantics") {
    val dup = TextSearch.searchScan(docs, "doc_id", "text",
        Seq("spark", "spark"))
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    val single = TextSearch.searchScan(docs, "doc_id", "text", Seq("spark"))
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(dup === single)
    assert(dup.map(_._1) === Seq(0L, 2L, 3L))
  }

  private val phraseDocs = Seq(
    (0L, "a b c a b c"),          // "a b c" twice, "b c a" once
    (1L, "a b x a b"),            // "a b" twice, never "a b c"
    (2L, "c b a"),                // reversed — no phrase hits
    (3L, "x x x"),                // "x x" overlapping: starts 0 and 1
    (4L, "a b c"),                // phrase at the exact doc boundary
    (5L, "b")).toDF("doc_id", "text") // shorter than any 2-gram

  test("phraseScan: consecutive-token matches only, overlapping " +
      "occurrences counted, boundary and short docs handled") {
    def scan(ph: String*) =
      TextSearch.phraseScan(phraseDocs, "doc_id", "text", ph)
        .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(scan("a", "b", "c") === Seq((0L, 2L), (4L, 1L)))
    assert(scan("a", "b") === Seq((0L, 2L), (1L, 2L), (4L, 1L)))
    assert(scan("x", "x") === Seq((3L, 2L)))  // overlapping starts
    assert(scan("b", "a") === Seq((2L, 1L)))  // order matters
    assert(scan("b") === Seq((0L, 2L), (1L, 2L), (2L, 1L), (4L, 1L),
      (5L, 1L)))
  }

  test("phraseSearch over positionalPostings agrees with phraseScan, " +
      "including repeated-term phrases") {
    val post = TextSearch.positionalPostings(phraseDocs, "doc_id", "text")
    for (ph <- Seq(Seq("a", "b", "c"), Seq("a", "b"), Seq("x", "x"),
        Seq("b", "a"), Seq("b"), Seq("a", "b", "c", "a"))) {
      val idx = TextSearch.phraseSearch(post, "doc_id", ph)
        .orderBy("doc_id").as[(Long, Long)].collect().toSeq
      val scn = TextSearch.phraseScan(phraseDocs, "doc_id", "text", ph)
        .orderBy("doc_id").as[(Long, Long)].collect().toSeq
      assert(idx === scn, s"phrase $ph")
    }
  }

  test("proximitySearch: NEAR-k over postings, either order, exact " +
      "pair counts, window boundary inclusive") {
    val d = Seq(
      (0L, "a x x b"),       // |0-3| = 3
      (1L, "b x a"),         // |2-0| = 2, reversed order
      (2L, "a b a"),         // pairs (0,1) (2,1) -> 2 pairs at k>=1
      (3L, "a x x x x b"),   // |0-5| = 5 > 3
      (4L, "a only")).toDF("doc_id", "text")
    val post = TextSearch.positionalPostings(d, "doc_id", "text")
    def near(k: Int) = TextSearch.proximitySearch(post, "doc_id",
        "a", "b", k)
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(near(3) === Seq((0L, 1L), (1L, 1L), (2L, 2L)))
    assert(near(2) === Seq((1L, 1L), (2L, 2L)))
    assert(near(1) === Seq((2L, 2L)))
  }

  test("phraseSnippets: first occurrence with context, clamped at both " +
      "document boundaries") {
    val d = Seq(
      (0L, "p q a b r s t a b u"),  // first "a b" at 2, ctx around it
      (1L, "a b tail1 tail2"),       // phrase at doc start
      (2L, "h1 h2 h3 a b"),          // phrase at doc end
      (3L, "no match here")).toDF("doc_id", "text")
    val r = TextSearch.phraseSnippets(d, "doc_id", "text",
        Seq("a", "b"), ctx = 2)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(r === Seq(
      (0L, 2L, 2L, "p q a b r s"),
      (1L, 1L, 0L, "a b tail1 tail2"),
      (2L, 1L, 3L, "h2 h3 a b")))
    val zero = TextSearch.phraseSnippets(d, "doc_id", "text",
        Seq("a", "b"), ctx = 0)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(zero.map(_._4) === Seq("a b", "a b", "a b"))
  }

  test("positionalPostings: one row per occurrence with 0-based pos") {
    val post = TextSearch.positionalPostings(phraseDocs, "doc_id", "text")
    assert(post.where($"doc_id" === 0L && $"tok" === "a")
      .select("pos").as[Int].collect().toSet === Set(0, 3))
    assert(post.where($"doc_id" === 5L).count() === 1L)
  }

  test("plan audit: phraseScan is shuffle-free; phraseSearch is a " +
      "broadcast slot join + exactly two bounded aggregations") {
    val scanPlan = TextSearch.phraseScan(phraseDocs, "doc_id", "text",
        Seq("a", "b")).queryExecution.executedPlan.toString
    assert(!scanPlan.contains("Exchange hashpartitioning"),
      s"want no shuffle:\n$scanPlan")
    val post = TextSearch.positionalPostings(phraseDocs, "doc_id", "text")
    val idxPlan = TextSearch.phraseSearch(post, "doc_id", Seq("a", "b"))
      .queryExecution.executedPlan.toString
    assert(idxPlan.contains("BroadcastHashJoin"),
      s"want broadcast slot join:\n$idxPlan")
    assert("Exchange hashpartitioning".r.findAllIn(idxPlan).size === 2,
      s"want exactly 2 shuffles (start votes, per-doc count):\n$idxPlan")
  }
  test("fuzzySearch expands typos across the vocabulary and scores " +
      "original-term coverage with deduped tf") {
    val docs = Seq(
      (1L, "the table holds a table"),   // table ×2
      (2L, "filter the table"),          // both terms via expansion
      (3L, "nothing here")).toDF("doc_id", "text")
    val post = TextSearch.postings(docs, "doc_id", "text")
    val vocab = post.select("tok").distinct()
    val got = TextSearch.fuzzySearch(post, vocab, "doc_id",
        Seq("tabl", "filtr"), maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq
    // doc 2 covers both query terms; doc 1 one term but tf 2
    assert(got === Seq((2L, 2L, 2L), (1L, 1L, 2L)))
    // a token within range of TWO query terms credits both but its
    // tf counts once: query ("tablf", "tablg") both expand to "table"
    val dbl = TextSearch.fuzzySearch(post, vocab, "doc_id",
        Seq("tablf", "tablg"), maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq
    assert(dbl === Seq((1L, 2L, 2L), (2L, 2L, 1L)))
  }
  test("prefixSearch expands over the vocabulary and scores by tf") {
    val docs = Seq(
      (1L, "filter filters filtering scan"),
      (2L, "filter table"),
      (3L, "nothing")).toDF("doc_id", "text")
    val post = TextSearch.postings(docs, "doc_id", "text")
    val got = TextSearch.prefixSearch(post,
        post.select("tok").distinct(), "doc_id", "fil")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq
    assert(got === Seq((1L, 3L, 3L), (2L, 1L, 1L)))
  }
}
