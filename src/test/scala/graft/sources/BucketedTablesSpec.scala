package graft.sources

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The point of bucketing is the ABSENCE of exchanges: a same-key,
  * same-bucket-count join must plan with zero ShuffleExchange operators,
  * while the plain-parquet join of the same data shuffles both sides. */
class BucketedTablesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }.size

  test("co-bucketed tables join and aggregate with zero shuffles") {
    val left = (0L until 1000L).map(i => (i, s"l$i")).toDF("k", "lv")
    val right = (0L until 1000L by 2).map(i => (i, i * 10)).toDF("k", "rv")
    BucketedTables.writeBucketed(left, "bt_left", "k", 4)
    BucketedTables.writeBucketed(right, "bt_right", "k", 4)
    val l = BucketedTables.read(spark, "bt_left")
    val r = BucketedTables.read(spark, "bt_right")
    withoutBroadcast {
      val joined = l.join(r, "k")
      assert(joined.count() === 500)
      assert(shuffles(joined) === 0,
        s"bucketed join should not exchange:\n${joined.queryExecution.executedPlan}")
      // groupBy on the bucket key rides the same layout — no exchange
      val agg = l.join(r, "k").groupBy("k").agg(sum("rv"))
      assert(shuffles(agg) === 0)
      // the same join over plain parquet shuffles both sides
      val plainDir = java.nio.file.Files.createTempDirectory("bt_plain").toString
      left.write.mode("overwrite").parquet(s"$plainDir/l")
      right.write.mode("overwrite").parquet(s"$plainDir/r")
      val plain = spark.read.parquet(s"$plainDir/l")
        .join(spark.read.parquet(s"$plainDir/r"), "k")
      assert(shuffles(plain) === 2)
    }
  }

  /** Force the sort-merge path with a STATIC plan: broadcast joins hide
    * exchanges at test scale (not the 100 TB fact⋈fact plan under audit
    * here), and AQE wraps exchanges in adaptive query stages that a
    * plan-node collect cannot see — so both are off while asserting. */
  private def withoutBroadcast[T](body: => T): T = {
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    val prevA = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      spark.conf.set("spark.sql.adaptive.enabled", prevA)
    }
  }
}
