package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Partitioned layout semantics: directory partitioning must round-trip
  * the data, prune statically on partition filters, and prune
  * DYNAMICALLY when the partition key arrives through a filtered dim
  * join (DPP — the plan feature that keeps a 100 TB fact scan bounded
  * by the dim filter). */
class PartitionedTablesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val events = Seq(
    (1L, 10L, 0L * 86400000000000L + 5L, "click"),
    (2L, 11L, 1L * 86400000000000L + 5L, "click"),
    (3L, 12L, 2L * 86400000000000L + 5L, "view"),
    (4L, 13L, 3L * 86400000000000L + 5L, "view"),
    (5L, 14L, 4L * 86400000000000L + 5L, "click"))
    .toDF("event_id", "user_id", "ts", "event_type")

  private lazy val path = {
    val p = java.nio.file.Files.createTempDirectory("graft_part").toString
    PartitionedTables.writeEventsByDay(events, p)
    p
  }

  test("round-trip: all rows and columns survive, day is recovered") {
    val back = PartitionedTables.read(spark, path)
    assert(back.count() === 5)
    assert(back.columns.toSet ===
      Set("event_id", "user_id", "ts", "event_type", "day"))
    // partition values come back type-inferred from directory names
    val d = back.where($"event_id" === 3L)
      .select(col("day").cast("long")).head().getLong(0)
    assert(d === 2L)
  }

  test("static pruning: a day filter reads only that directory") {
    val one = PartitionedTables.read(spark, path).where($"day" === 1L)
    assert(one.select("event_id").as[Long].collect().toSeq === Seq(2L))
    val scan = one.queryExecution.executedPlan.toString
    // the partition filter must reach the scan, not a post-scan Filter
    assert(scan.contains("PartitionFilters") &&
      scan.matches("(?s).*PartitionFilters: \\[[^\\]]*day[^\\]]*\\].*"))
  }

  test("dynamic partition pruning fires for a filtered dim join") {
    val prev = spark.conf.getOption(
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio")
    // the toy fact table is tiny; force DPP to consider it worthwhile
    spark.conf.set(
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio", "10000")
    try {
      // dim must be a real source with a Filter node (a LocalRelation
      // constant-folds the filter away and DPP sees no selective
      // predicate) and its key must match the inferred partition type
      val dimPath = java.nio.file.Files
        .createTempDirectory("graft_dim").toString
      Seq((0, "keep"), (1, "keep"), (4, "drop")).toDF("day", "tag")
        .write.mode("overwrite").parquet(dimPath)
      val dim = spark.read.parquet(dimPath)
      val joined = PartitionedTables.read(spark, path)
        .join(dim.where($"tag" === "keep"), "day")
      assert(PartitionedTables.hasDynamicPruning(joined),
        "expected a dynamicpruning subquery on the partitioned scan; got:\n" +
          joined.queryExecution.executedPlan.toString.take(4000))
      assert(joined.select("event_id").as[Long].collect().sorted.toSeq ===
        Seq(1L, 2L))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(
          "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio", v)
        case None => spark.conf.unset(
          "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio")
      }
    }
  }

  test("readEvolved: a shard that added a column merges; the old " +
      "shard reads NULL there and values survive") {
    val p = java.nio.file.Files.createTempDirectory("graft_evolve").toString
    Seq((1L, 10L), (2L, 20L)).toDF("id", "x")
      .write.mode("overwrite").parquet(s"$p/v1")
    Seq((3L, 30L, "en"), (4L, 40L, "fr")).toDF("id", "x", "lang")
      .write.mode("overwrite").parquet(s"$p/v2")
    val merged = PartitionedTables.readEvolved(spark, s"$p/v1", s"$p/v2")
    assert(merged.columns.toSet === Set("id", "x", "lang"))
    val got = merged.collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.getAs[String]("lang")))).toSet
    assert(got === Set((1L, 10L, None), (2L, 20L, None),
      (3L, 30L, Some("en")), (4L, 40L, Some("fr"))))
  }
}
