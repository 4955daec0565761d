package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class UnicodeNormSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("nfc composes combining sequences to the precomposed forms") {
    val decomposed = "café naïve Å"
    val composed = "café naïve Å"
    val got = Seq(decomposed, composed).toDF("t")
      .select(TextAnalysis.nfc(col("t")).as("n"))
      .collect().map(_.getString(0))
    assert(got(0) === composed)
    assert(got(1) === composed) // idempotent on already-composed input
  }

  test("nfkc additionally folds ligatures and fullwidth forms") {
    val weird = "ﬁle ＡＢＣ" // ﬁle ＡＢＣ
    val got = Seq(weird).toDF("t")
      .select(TextAnalysis.nfkc(col("t")).as("n"),
        TextAnalysis.nfc(col("t")).as("c"))
      .head()
    assert(got.getString(0) === "file ABC")
    assert(got.getString(1) === weird) // NFC alone folds neither
  }

  test("ascii passes through unchanged; SQL surface registered") {
    graft.GraftFunctions.register(spark)
    val got = spark.sql(
      "SELECT graft_nfc('plain ascii'), graft_nfkc('plain ascii')").head()
    assert(got.getString(0) === "plain ascii")
    assert(got.getString(1) === "plain ascii")
  }

  test("stripAccents folds diacritics from both composed and decomposed " +
      "forms; ascii untouched") {
    graft.GraftFunctions.register(spark)
    val got = spark.sql(
      "SELECT graft_strip_accents('caf\u00e9 na\u00efve \u00c5'), " +
        "graft_strip_accents('cafe\u0301 nai\u0308ve A\u030a'), " +
        "graft_strip_accents('plain ascii text')").head()
    assert(got.getString(0) === "cafe naive A")
    assert(got.getString(1) === "cafe naive A")
    assert(got.getString(2) === "plain ascii text")
  }
}
