package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class PrivacySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val people = Seq(
    // (id, zip, age) — zip 100 is a crowd, zip 200 a pair, zip 300 lone
    (1L, 100L, 30L), (2L, 100L, 31L), (3L, 100L, 32L), (4L, 100L, 33L),
    (5L, 200L, 40L), (6L, 200L, 41L),
    (7L, 300L, 50L))
    .toDF("id", "zip", "age")

  test("kAnonymityGroups reports sizes and the k verdict") {
    val got = Privacy.kAnonymityGroups(people, Seq("zip"), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === Set((100L, 4L, 1), (200L, 2L, 0), (300L, 1L, 0)))
  }

  test("kAnonymize suppresses every row of an under-k group and " +
      "keeps qualifying groups whole") {
    val kept = Privacy.kAnonymize(people, Seq("zip"), k = 3)
      .select("id").as[Long].collect().sorted.toSeq
    assert(kept === Seq(1L, 2L, 3L, 4L))
    // multi-column quasi: (zip, age) makes every row unique → all out
    assert(Privacy.kAnonymize(people, Seq("zip", "age"), k = 2)
      .count() === 0L)
  }

  test("lDiversityGroups counts distinct sensitive values, not rows") {
    // zip 100 is 4-strong but HOMOGENEOUS in disease → fails l=2;
    // zip 200 is only a pair but carries 2 distinct values → passes
    val df = Seq(
      (1L, 100L, "flu"), (2L, 100L, "flu"), (3L, 100L, "flu"),
      (4L, 100L, "flu"),
      (5L, 200L, "flu"), (6L, 200L, "cold"),
      (7L, 300L, "zika"))
      .toDF("id", "zip", "disease")
    val got = Privacy.lDiversityGroups(df, Seq("zip"), "disease", l = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .toSet
    assert(got === Set((100L, 4L, 1L, 0), (200L, 2L, 2L, 1),
      (300L, 1L, 1L, 0)))
    val kept = Privacy.lDiversify(df, Seq("zip"), "disease", l = 2)
      .select("id").as[Long].collect().sorted.toSeq
    assert(kept === Seq(5L, 6L))
    // NULL sensitive values are absent, never a diversity credit
    val withNull = Seq((1L, 9L, Some("flu")), (2L, 9L, None))
      .toDF("id", "zip", "disease")
    val r = Privacy.lDiversityGroups(withNull, Seq("zip"), "disease", 2)
      .collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getInt(3)) === ((2L, 1L, 0)))
    // a sensitive column doubling as a quasi-identifier is a misuse
    intercept[IllegalArgumentException] {
      Privacy.lDiversityGroups(df, Seq("zip", "disease"), "disease", 2)
    }
  }

  test("tClosenessGroups computes the exact cross-multiplied EMD and " +
      "the threshold verdict") {
    // global bands [0,0,0,0,1,2,2]: N=7, m=3
    // zip1 [0,0,0,2]: cums |3·7−4·4|=5, |3·7−5·4|=1, |4·7−7·4|=0 → 6
    //   EMD = 6/(4·7·2) ≈ 0.107
    // zip2 [0,1,2]:   cums |1·7−4·3|=5, |2·7−5·3|=1, |3·7−7·3|=0 → 6
    //   EMD = 6/(3·7·2) ≈ 0.143
    val df = Seq(
      (1L, 10L, 0L), (2L, 10L, 0L), (3L, 10L, 0L), (4L, 10L, 2L),
      (5L, 20L, 0L), (6L, 20L, 1L), (7L, 20L, 2L))
      .toDF("id", "zip", "band")
    val got = Privacy.tClosenessGroups(df, Seq("zip"), "band",
        tX1e6 = 120000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getInt(4))).toSet
    assert(got === Set((10L, 4L, 3L, 6L, 1), (20L, 3L, 3L, 6L, 0)))
    // a group mirroring the global distribution exactly has EMD 0 and
    // passes even t = 0
    val mirror = Seq((1L, 1L, 0L), (2L, 1L, 1L), (3L, 2L, 0L),
      (4L, 2L, 1L)).toDF("id", "zip", "band")
    assert(Privacy.tClosenessGroups(mirror, Seq("zip"), "band", 0L)
      .collect().map(r => (r.getLong(3), r.getInt(4))).toSet ===
      Set((0L, 1)))
    // single sensitive value globally (m = 1): vacuously close
    val mono = Seq((1L, 1L, 5L), (2L, 2L, 5L)).toDF("id", "zip", "band")
    assert(Privacy.tClosenessGroups(mono, Seq("zip"), "band", 0L)
      .collect().map(_.getInt(4)).toSeq === Seq(1, 1))
  }

  test("tClosenessBuckets == tClosenessGroups over a pre-bucketed column; " +
      "cell-count form merges shards exactly") {
    // high-cardinality numeric sensitive values, incl. negatives
    val rnd = new scala.util.Random(11)
    val rows = (0L until 300L).map(i =>
      (i, (i % 4) * 10L, rnd.nextInt(20001) - 10000L))
    val df = rows.toDF("id", "zip", "salary")
    val w = 1000L
    val viaBuckets = Privacy.tClosenessBuckets(df, Seq("zip"), "salary",
      tX1e6 = 100000L, bucketWidth = w).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4))).toSet
    val viaPre = Privacy.tClosenessGroups(
      df.withColumn("salary_b", Privacy.generalized(col("salary"), w)),
      Seq("zip"), "salary_b", tX1e6 = 100000L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4))).toSet
    assert(viaBuckets === viaPre)
    // the grid is bounded by the bucket count, not the distinct values
    assert(viaBuckets.forall(_._3 <= 21L))
    // mergeable state: per-shard cell histograms summed == whole-table
    val cellsA = df.where(col("id") % 2 === 0)
      .select(col("zip"), Privacy.generalized(col("salary"), w).as("vb"))
      .groupBy("zip", "vb").agg(count(lit(1)).as("cnt"))
    val cellsB = df.where(col("id") % 2 === 1)
      .select(col("zip"), Privacy.generalized(col("salary"), w).as("vb"))
      .groupBy("zip", "vb").agg(count(lit(1)).as("cnt"))
    val merged = Privacy.tClosenessFromCellCounts(
      cellsA.unionByName(cellsB), Seq("zip"), "vb", tX1e6 = 100000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getInt(4))).toSet
    assert(merged === viaBuckets)
  }

  test("generalized banding is integer-exact (negatives included) and " +
      "coarsening strictly grows groups") {
    val bands = people.select(Privacy.generalized(col("age"), 10L)
      .as("band")).as[Long].collect().toSeq
    assert(bands === Seq(30L, 30L, 30L, 30L, 40L, 40L, 50L))
    assert(Seq(-1L, -2000L, -2001L, 1999L, 2000L).toDF("x")
      .select(Privacy.generalized(col("x"), 2000L).as("b"))
      .as[Long].collect().toSeq === Seq(-2000L, -2000L, -4000L, 0L, 2000L))
    // banding age to width 100 merges all zips' ages → zip stays the
    // only splitter, so the (zip, band) report equals the zip report
    val coarse = Privacy.kAnonymityGroups(
      people.withColumn("band", Privacy.generalized(col("age"), 100L)),
      Seq("zip", "band"), k = 3)
      .select("zip", "n").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(coarse === Set((100L, 4L), (200L, 2L), (300L, 1L)))
  }
  test("pseudonym is consistent, salt-dependent, and NULL-preserving") {
    import org.apache.spark.sql.functions.col
    val df = Seq(Some(7L), Some(7L), Some(8L), None).toDF("id")
    val toks = df.select(Privacy.pseudonym(col("id"), "s1").as("t"))
      .collect().map(r => Option(r.getString(0))).toSeq
    assert(toks(0) === toks(1))            // consistent
    assert(toks(0) !== toks(2))            // distinct ids differ
    assert(toks(3).isEmpty)                // NULL stays NULL
    assert(toks(0).get.length === 16)
    val other = df.select(Privacy.pseudonym(col("id"), "s2").as("t"))
      .collect()(0).getString(0)
    assert(other !== toks(0).get)          // salt changes the mapping
  }
}
