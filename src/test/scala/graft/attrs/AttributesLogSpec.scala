package graft.attrs

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class AttributesLogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // (entity, name, value, seq) — replay log with overwrites
  private lazy val log = Seq(
    (1L, "color", "red", 1L),
    (1L, "color", "blue", 2L),   // wins
    (1L, "size", "xl", 1L),
    (2L, "color", "green", 5L),  // wins over seq 3
    (2L, "color", "black", 3L),
    (3L, "size", "s", 9L))
    .toDF("id", "name", "value", "seq")

  test("resolve: last write wins per (entity, name)") {
    val r = AttributesLog.resolve(log, Seq("id", "name"), Seq("seq"))
      .orderBy("id", "name")
      .select("id", "name", "value").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getString(2))).toSeq
    assert(r === Seq(
      (1L, "color", "blue"), (1L, "size", "xl"),
      (2L, "color", "green"), (3L, "size", "s")))
  }

  test("resolveFor: restricted to hit entities only") {
    val hits = Seq(Tuple1(1L)).toDF("id")
    val r = AttributesLog.resolveFor(log, hits, "id", Seq("id", "name"), Seq("seq"))
      .select("id").distinct().collect().map(_.getLong(0)).toSeq
    assert(r === Seq(1L))
  }

  test("resolve: deterministic tie-break via secondary seq column") {
    val tied = Seq(
      (1L, "k", "a", 1L, 10L),
      (1L, "k", "b", 1L, 20L)) // same seq, higher sub-seq wins
      .toDF("id", "name", "value", "seq", "sub")
    val r = AttributesLog.resolve(tied, Seq("id", "name"), Seq("seq", "sub"))
      .select("value").collect().map(_.getString(0)).toSeq
    assert(r === Seq("b"))
  }
}
