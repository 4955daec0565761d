package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class OrcTablesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val path = {
    val p = java.nio.file.Files.createTempDirectory("graft_orc").toString
    val docs = Seq(
      (1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L), (4L, "b", 40L),
      (5L, "c", 50L))
      .toDF("doc_id", "source", "n_chars")
    OrcTables.writePartitioned(docs, p, "source")
    p
  }

  test("round-trip: rows, columns and partition values survive") {
    val back = OrcTables.read(spark, path)
    assert(back.count() === 5)
    assert(back.columns.toSet === Set("doc_id", "source", "n_chars"))
    val got = back.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("n_chars"))).toSet
    assert(got === Set((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L),
      (4L, "b", 40L), (5L, "c", 50L)))
  }

  test("partition predicate prunes directories; data predicate is " +
      "pushed to the ORC scan") {
    val q = OrcTables.read(spark, path)
      .where(col("source") === "a" && col("n_chars") >= 20L)
      .select("doc_id")
    assert(q.as[Long].collect().toSeq === Seq(2L))
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.matches("(?s).*PartitionFilters: \\[[^\\]]*source[^\\]]*\\].*"))
    assert(scan.matches(
      "(?s).*PushedFilters: \\[[^\\]]*n_chars[^\\]]*\\].*"))
    // projection pruning: only the selected + filtered columns are read
    assert(scan.matches("(?s).*ReadSchema: [^\\n]*doc_id[^\\n]*n_chars.*"))
    assert(!scan.matches("(?s).*ReadSchema: [^\\n]*text.*"))
  }
}
