package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-skew telemetry and the salted-join rewrite for RELATIONAL
  * equi-joins — [[graft.query.AnnJoin]]'s cell-histogram salting
  * generalized to arbitrary join keys. At 100 TB one hot key serializes
  * its whole bucket into a single straggler task; the fix is mechanical
  * (salt the probe side, replicate the build side) but only worth its
  * replication cost where the telemetry says so — so the planner and the
  * rewrite ship together, and the rewrite's OUTPUT is bit-identical to
  * the plain join (the gate asserts exactly that).
  *
  * AQE's skew-join handling covers sort-merge joins after the fact;
  * this operator is the explicit form for when the plan must be fixed
  * ahead of time (broadcast-unable dimension, bucketed layouts, or a
  * deterministic plan contract).
  */
object SkewJoin {

  /** One-row key-skew telemetry for a prospective join key, all-integer:
    * (n_keys, n_rows, max_cnt, skew_x100 = ⌈100·max/mean⌉, salt =
    * min(64, max(1, ⌈max/mean⌉))) — mean over PRESENT keys; the same
    * ceil'd max/mean rule as [[graft.query.AnnJoin.recommendedSalt]].
    * The distributed part is one map-side-combined count per key + a
    * metadata-sized aggregate; the ceil-div arithmetic runs driver-side
    * in BigInt over that single row — max_cnt·n_keys would overflow a
    * Long in-plan once both factors pass ~3e9, which multi-billion-row
    * relations reach (the same overflow class Profile.compare's
    * cross-multiply had). */
  def keyStats(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "keyStats needs at least one key column")
    val spark = df.sparkSession
    import spark.implicits._
    val r = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
      .agg(count(lit(1)).as("n_keys"),
        coalesce(sum(col("cnt")), lit(0L)).as("n_rows"),
        coalesce(max(col("cnt")), lit(0L)).as("max_cnt"))
      .head()
    val (nKeys, nRows, maxCnt) =
      (r.getLong(0), r.getLong(1), r.getLong(2))
    def ceilDiv(a: BigInt, b: Long): Long = ((a + b - 1) / b).toLong
    val (skew, salt) =
      if (nRows == 0) (0L, 1L)
      else (ceilDiv(BigInt(maxCnt) * nKeys * 100, nRows),
        math.min(64L, math.max(1L, ceilDiv(BigInt(maxCnt) * nKeys, nRows))))
    Seq((nKeys, nRows, maxCnt, skew, salt))
      .toDF("n_keys", "n_rows", "max_cnt", "skew_x100", "salt")
  }

  /** The [[keyStats]] salt for a relation, collected — the driver-side
    * knob feeding [[saltedInnerJoin]]. */
  def recommendedSalt(df: DataFrame, keyCols: Seq[String]): Int =
    keyStats(df, keyCols).head().getAs[Long]("salt").toInt

  /** [[saltedInnerJoin]] with the salt derived from the left side's own
    * key histogram ([[recommendedSalt]]) — the auto mode, one extra
    * narrow count job, the [[graft.query.AnnJoin]] resolveSalt pattern.
    * Uniform keys resolve to salt 1, i.e. the plain join. */
  def saltedInnerJoinAuto(left: DataFrame, right: DataFrame,
                          keys: Seq[String]): DataFrame =
    saltedInnerJoin(left, right, keys, recommendedSalt(left, keys))

  /** Skew-salted inner equi-join, OUTPUT-IDENTICAL to
    * `left.join(right, keys)`: the (large, skewed) left side gets a
    * deterministic per-row salt in [0, salt) hashed from its whole row
    * (xxhash64 over all columns — spreading even a single hot key's rows
    * uniformly), the (smaller) right side is replicated `salt`× via a
    * narrow explode, and the join runs on keys :+ salt — so one hot
    * key's rows land in `salt` tasks instead of one. Cost: right-side
    * rows shuffle salt× (linear replication, the documented trade);
    * never a broadcast requirement. */
  def saltedInnerJoin(left: DataFrame, right: DataFrame,
                      keys: Seq[String], salt: Int): DataFrame = {
    require(salt >= 1, s"salt must be >= 1, got $salt")
    require(keys.nonEmpty, "saltedInnerJoin needs join keys")
    require(!left.columns.contains("__sj_salt") &&
      !right.columns.contains("__sj_salt"),
      "saltedInnerJoin reserves the column name __sj_salt; rename it " +
        "before joining")
    val l = left.withColumn("__sj_salt",
      pmod(xxhash64(left.columns.map(col).toIndexedSeq: _*), lit(salt.toLong)))
    val r = right.withColumn("__sj_salt",
      explode(lit((0L until salt.toLong).toArray)))
    l.join(r, keys :+ "__sj_salt").drop("__sj_salt")
  }
}
