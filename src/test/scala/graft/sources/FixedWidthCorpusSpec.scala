package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.FixedWidthCorpus.Field

/** FixedWidthCorpus: round trip, both quarantine triggers, layout
  * gaps, and the writer's padding rules. */
class FixedWidthCorpusSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val layout = Seq(
    Field("id", 1, 5, numeric = true),
    Field("name", 6, 8, numeric = false),
    Field("qty", 14, 4, numeric = true))

  test("render pads numerics with zeros, text with spaces, and the " +
      "round trip is exact") {
    val df = Seq((7L, "ab", 42L), (123L, "widget", 5L))
      .toDF("id", "name", "qty")
    val lines = FixedWidthCorpus.render(df, layout)
      .as[String].collect().sorted.toSeq
    assert(lines === Seq("00007ab      0042", "00123widget  0005"))
    assert(lines.forall(_.length === FixedWidthCorpus.recordWidth(layout)))
    val tmp = Files.createTempDirectory("fw_rt").toString
    FixedWidthCorpus.render(df, layout).write.mode("overwrite")
      .text(s"$tmp/d")
    val (clean, q) = FixedWidthCorpus.read(spark, s"$tmp/d", layout)
    assert(q.count() === 0L)
    assert(clean.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2))).toSet ===
      Set((7L, "ab", 42L), (123L, "widget", 5L)))
  }

  test("length mismatch, non-numeric and blank-numeric lines are " +
      "quarantined; gaps in the layout are skipped") {
    val tmp = Files.createTempDirectory("fw_q").toString
    Files.writeString(java.nio.file.Paths.get(s"$tmp/f.txt"),
      Seq(
        "00007ab      0042",  // clean
        "00007ab      42",    // short → length trigger
        "0000xab      0042",  // letter in id → numeric trigger
        "00007ab          ",  // blank qty → numeric required
        "00008cd      0001X"  // overlong → length trigger
      ).mkString("\n") + "\n")
    val (clean, q) = FixedWidthCorpus.read(spark, s"$tmp/f.txt", layout)
    assert(clean.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ===
      Seq((7L, "ab", 42L)))
    assert(q.as[String].collect().length === 4)
    // a layout with a gap (cols 6-13 unread) parses around the hole
    val gappy = Seq(Field("id", 1, 5, numeric = true),
      Field("qty", 14, 4, numeric = true))
    val (c2, q2) = FixedWidthCorpus.read(spark, s"$tmp/f.txt", gappy)
    assert(c2.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((7L, 42L)))
    assert(q2.count() === 4L)
  }

  test("negative numerics parse through the trim+cast path") {
    val tmp = Files.createTempDirectory("fw_n").toString
    Files.writeString(java.nio.file.Paths.get(s"$tmp/f.txt"),
      "  -42x       0007\n")
    val (clean, q) = FixedWidthCorpus.read(spark, s"$tmp/f.txt", layout)
    assert(q.count() === 0L)
    assert(clean.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ===
      Seq((-42L, "x", 7L)))
  }
}
