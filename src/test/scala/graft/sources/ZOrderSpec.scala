package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Z-order layout semantics: the Morton code must match a bit-twiddling
  * reference exactly (it is the oracle-checked layout key), and the
  * layout must deliver the thing it exists for — file-level min/max
  * pruning on BOTH dimensions, where a single-column sort prunes one. */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mortonRef(a: Long, b: Long, bits: Int): Long = {
    val top = (1L << bits) - 1
    val ca = math.min(math.max(a, 0L), top)
    val cb = math.min(math.max(b, 0L), top)
    (0 until bits).map { i =>
      (((ca >> i) & 1L) << (2 * i)) | (((cb >> i) & 1L) << (2 * i + 1))
    }.sum
  }

  test("zValue2 matches the bit-twiddling reference, clamps out-of-range") {
    val rnd = new scala.util.Random(7)
    val pts = Seq((0L, 0L), (65535L, 65535L), (-5L, 70000L), (1L, 2L)) ++
      (1 to 200).map(_ => (rnd.nextLong(131072) - 1000, rnd.nextLong(131072) - 1000))
    val got = pts.toDF("a", "b")
      .select(ZOrder.zValue2($"a", $"b", 16).as("zv"))
      .collect().map(_.getLong(0)).toSeq
    assert(got === pts.map { case (a, b) => mortonRef(a, b, 16) })
  }

  test("z-curve locality: a box in (a,b) maps to few z-ranges") {
    // adjacent cells in a 2^k grid differ in low interleaved bits: the
    // z-range spanned by a small box is far smaller than the key space
    val boxZs = for (a <- 100L to 107L; b <- 200L to 207L)
      yield mortonRef(a, b, 16)
    assert(boxZs.max - boxZs.min < (1L << 18)) // not the full 2^32 space
  }

  test("z-ordered files prune box predicates where a single-column sort cannot") {
    // a dense 64x64 grid of keys, written 16 files both ways
    val grid = (for (a <- 0 until 64; b <- 0 until 64)
      yield (a.toLong * 64 + b, a.toLong, b.toLong))
      .toDF("id", "a", "b")
    val zPath = java.nio.file.Files.createTempDirectory("graft_z").toString
    val sPath = java.nio.file.Files.createTempDirectory("graft_s").toString
    ZOrder.writeZOrdered(grid, zPath, "a", "b", numFiles = 16, bits = 6)
    grid.repartitionByRange(16, $"a").sortWithinPartitions("a")
      .write.mode("overwrite").parquet(sPath)

    // per-file min/max of both dims = exactly what parquet zone maps hold
    def fileBounds(path: String) =
      spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min("a").as("a0"), max("a").as("a1"),
          min("b").as("b0"), max("b").as("b1"))
        .collect()
    def overlapping(path: String, a0: Long, a1: Long, b0: Long, b1: Long) =
      fileBounds(path).count(r =>
        r.getLong(1) <= a1 && r.getLong(2) >= a0 &&
          r.getLong(3) <= b1 && r.getLong(4) >= b0)

    // box on BOTH dims: z-order touches a corner of the curve; the
    // a-sorted layout overlaps every file on b (b is random per file)
    val zBoth = overlapping(zPath, 0, 15, 0, 15)
    val sBoth = overlapping(sPath, 0, 15, 0, 15)
    assert(zBoth < sBoth)

    // predicate on b ALONE: a-sorted layout cannot prune at all
    val zB = fileBounds(zPath).count(r => r.getLong(3) <= 7 && r.getLong(4) >= 0)
    val sB = fileBounds(sPath).count(r => r.getLong(3) <= 7 && r.getLong(4) >= 0)
    assert(sB === 16)   // every file spans the full b range
    assert(zB < 16)     // z-files are bounded in b too
  }
}
