package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class NaiveBayesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // T_fruit = 5, T_animal = 2, V = 4 (apple banana dog cat), priors 2/3, 1/3
  private lazy val train = Seq(
    ("apple apple banana", "fruit"),
    ("apple banana", "fruit"),
    ("dog cat", "animal")).toDF("text", "label")
  private lazy val test_ = Seq(
    (1L, "apple banana"),
    (2L, "dog dog"),
    (3L, "unseen")).toDF("doc_id", "text")

  test("fitScores: one row per (doc, class), hand-computed integer scores") {
    val r = NaiveBayes.fitScores(train, test_)
      .collect().map(x => (x.getLong(0), x.getString(1)) -> x.getLong(3)).toMap
    assert(r.size === 6)
    // doc 2 "dog dog": fruit = 1e6*2/3 + 2*(1e6*1/9)   = 666666 + 222222
    //                  animal = 1e6*1/3 + 2*(1e6*2/6)  = 333333 + 666666
    assert(r((2L, "fruit")) === 666666L + 2 * 111111L)
    assert(r((2L, "animal")) === 333333L + 2 * 333333L)
    // doc 3 "unseen": zero-count smoothing in both classes
    assert(r((3L, "fruit")) === 666666L + 111111L)
    assert(r((3L, "animal")) === 333333L + 166666L)
  }

  test("classify: argmax per doc, matches the obvious labels") {
    val r = NaiveBayes.classify(train, test_)
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r === Map(1L -> "fruit", 2L -> "animal", 3L -> "fruit"))
  }

  test("logScores: textbook log-space NB against hand computation") {
    val r = NaiveBayes.logScores(train, test_)
      .collect().map(x => (x.getLong(0), x.getString(1)) -> x.getDouble(2)).toMap
    val fruit2 = math.log(2.0 / 3) + 2 * math.log(1.0 / 9)
    val animal2 = math.log(1.0 / 3) + 2 * math.log(2.0 / 6)
    assert(math.abs(r((2L, "fruit")) - fruit2) < 1e-12)
    assert(math.abs(r((2L, "animal")) - animal2) < 1e-12)
    // both rules agree on this fixture's argmax for every doc
    val predLog = Seq(1L, 2L, 3L).map { d =>
      d -> Seq("fruit", "animal").maxBy(c => r((d, c)))
    }.toMap
    assert(predLog === Map(1L -> "fruit", 2L -> "animal", 3L -> "fruit"))
  }

  test("fitScores equals an independent in-JVM replica on random corpora") {
    val rnd = new scala.util.Random(17)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    val labels = Vector("x", "y", "z")
    for (round <- 1 to 5) {
      val trainRows = (0 until 30).map { _ =>
        (Seq.fill(rnd.nextInt(8) + 1)(vocab(rnd.nextInt(vocab.size)))
          .mkString(" "), labels(rnd.nextInt(labels.size)))
      }
      val testRows = (0 until 10).map { i =>
        (i.toLong, Seq.fill(rnd.nextInt(8) + 1)(
          vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      // independent replica: plain Scala counting, same integer rule
      val cnt = scala.collection.mutable.Map[(String, String), Long]()
        .withDefaultValue(0L)
      val tot = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
      val pri = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
      trainRows.foreach { case (t, l) =>
        pri(l) += 1
        t.split(" ").foreach { w => cnt((l, w)) += 1; tot(l) += 1 }
      }
      val v = trainRows.flatMap(_._1.split(" ")).distinct.size.toLong
      val nTrain = trainRows.size.toLong
      def score(doc: String, l: String): Long =
        (1000000L * pri(l)) / nTrain +
          doc.split(" ").map(w => (1000000L * (cnt((l, w)) + 1)) /
            (tot(l) + v)).sum
      val want = (for {
        (id, doc) <- testRows
        l <- pri.keys
      } yield (id, l) -> score(doc, l)).toMap
      val got = NaiveBayes.fitScores(trainRows.toDF("text", "label"),
          testRows.toDF("doc_id", "text"))
        .collect()
        .map(x => (x.getLong(0), x.getString(1)) -> x.getLong(3)).toMap
      assert(got === want, s"round $round")
    }
  }

  test("a class whose docs carry no tokens keeps its prior (T_c = 0)") {
    val tr = Seq((Option("x y"), "a"), (Option.empty[String], "b"))
      .toDF("text", "label")
    val q = Seq((1L, "x")).toDF("doc_id", "text")
    val r = NaiveBayes.fitScores(tr, q).collect()
      .map(x => x.getString(1) -> x.getLong(3)).toMap
    // both classes present; V = 2 (x, y), nTrain = 2
    // a: prior 500000 + (1e6*(1+1)) div (2+2) = 500000 + 500000
    // b: prior 500000 + (1e6*(0+1)) div (0+2) = 500000 + 500000
    assert(r.keySet === Set("a", "b"))
    assert(r("a") === 1000000L)
    assert(r("b") === 1000000L)
  }

  test("classify: ties break to the smallest label, deterministically") {
    // symmetric training data => symmetric scores for a both-ways doc
    val sym = Seq(("x", "a"), ("y", "b")).toDF("text", "label")
    val q = Seq((1L, "z")).toDF("doc_id", "text")
    val r = NaiveBayes.classify(sym, q).collect()
    assert(r.length === 1)
    assert(r.head.getString(1) === "a")
  }
}
