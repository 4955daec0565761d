package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** 2-D Pareto frontier (skyline query, Börzsönyi et al. 2001): the
  * rows no other row dominates, maximizing both dimensions — p
  * dominates q iff p.x ≥ q.x ∧ p.y ≥ q.y with at least one strict.
  * The multi-objective "best trade-offs" pick (quality vs length,
  * recall vs cost) that a top-k on any single score can't express;
  * exact duplicates on both dimensions dominate neither and all
  * survive. Negate a column to minimize it.
  *
  * Shape: the classic sort-scan collapses to relational algebra —
  * one per-x max (domain-sized groupBy), one running max over the
  * DISTINCT-x relation sorted descending (domain-sized single
  * partition, the documented [[graft.pipeline.Sketches
  * .quantilesFromHistogram]] bound — fine for the bounded domains a
  * skyline is asked over), and one equality join back. The corpus
  * itself is never globally sorted. All comparisons integer-exact.
  */
object Skyline {

  def frontier2D(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // a row missing either dimension can neither dominate nor be
    // ranked — drop it rather than let NULL comparisons decide
    val base = df.where(col(xCol).isNotNull && col(yCol).isNotNull)
    val perX = base.groupBy(col(xCol)).agg(max(col(yCol)).as("__ymax"))
    // best y among STRICTLY greater x — a row survives only above it
    // (equality loses: the bigger-x point with the same y dominates)
    val w = Window.orderBy(col(xCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val front = perX
      .withColumn("__best", max(col("__ymax")).over(w))
      .where(col("__best").isNull || col("__ymax") > col("__best"))
      .select(col(xCol), col("__ymax"))
    base.join(front, Seq(xCol))
      .where(col(yCol) === col("__ymax"))
      .drop("__ymax")
  }

  /** d-DIMENSIONAL Pareto frontier — the general form [[frontier2D]]'s
    * running-max trick cannot express past two dimensions. Dominance:
    * p dominates q iff p ≥ q on EVERY listed column with at least one
    * strict; all columns maximize (negate to minimize); rows with any
    * NULL dimension are dropped; exact duplicates across all
    * dimensions dominate neither and all survive.
    *
    * Shape (grid-partitioned dominance pruning, the BNL→grid
    * refinement of Börzsönyi et al. 2001 for a cluster): each
    * dimension is cut into ≤`gridBuckets` equal-frequency cells by
    * [[graft.pipeline.TrainingData.equalFreqBucket]]'s histogram
    * boundaries (mergeable aggregate + domain-sized window — no
    * corpus sort), giving every row an integer grid coordinate. The
    * non-empty cell list is metadata-sized (≤ gridBuckets^d, and
    * ≤ the row count): a cell is PRUNED when some other non-empty
    * cell's open lower corner dominates its closed upper corner
    * (∀i aᵢ−1 ≥ bᵢ — every point there beats every point here
    * strictly on all dims), which discards the dominated bulk without
    * a single row comparison. The exact check then runs only inside
    * cell PAIRS that can still interact (∀i aᵢ ≥ bᵢ, self-pairs
    * included): candidates join through the broadcast pair relation
    * and dominated rows anti-join out. Worst case (fully
    * anti-correlated data, skyline ≈ corpus) degrades to the
    * quadratic check every exact skyline has — the grid bounds the
    * damage to interacting cell pairs. */
  def frontierND(df: DataFrame, dimCols: Seq[String],
                 gridBuckets: Int = 16): DataFrame = {
    require(dimCols.size >= 2, "skyline needs at least two dimensions")
    require(dimCols.distinct.size == dimCols.size,
      s"duplicate dimension in ${dimCols.mkString(", ")}")
    require(gridBuckets >= 2, s"gridBuckets must be >= 2, got $gridBuckets")
    require(math.pow(gridBuckets.toDouble, dimCols.size.toDouble) <= 16384.0,
      s"grid too fine: $gridBuckets^${dimCols.size} cells exceed the " +
        "16384-cell driver bound — lower gridBuckets for high dimension " +
        "counts (the pruning loop is quadratic in non-empty cells)")
    val spark = df.sparkSession
    import spark.implicits._
    val gCols = dimCols.indices.map(i => s"__g$i")
    val base0 = localPrune(
      df.where(dimCols.map(col(_).isNotNull).reduce(_ && _)), dimCols)
    val gridded = dimCols.zipWithIndex.foldLeft(base0) {
      case (acc, (d, i)) =>
        graft.pipeline.TrainingData
          .equalFreqBucket(acc, d, Seq.empty, gridBuckets,
            descending = false)
          .withColumnRenamed("bucket", s"__g$i")
    }.localCheckpoint()
    val cells = gridded.groupBy(gCols.map(col): _*)
      .agg(count(lit(1)).as("__c"))
      .collect().map(r => gCols.indices.map(i => r.getLong(i)).toVector)
    // driver-side cell pruning + interacting-pair derivation —
    // both loops are over the non-empty cell list, never rows
    val kept = cells.filterNot(b => cells.exists(a =>
      a.indices.forall(i => a(i) - 1 >= b(i))))
    val pairs = (for {
      a <- kept; b <- kept
      if a.indices.forall(i => a(i) >= b(i))
    } yield (a.mkString(","), b.mkString(","))).toSeq
      .toDF("__ca", "__cb")
    val cellKey = concat_ws(",", gCols.map(col): _*)
    val keptDf = gridded
      .withColumn("__cell", cellKey)
      .where(col("__cell").isin(kept.map(_.mkString(",")): _*))
    val left = keptDf.select(
      (dimCols.map(d => col(d).as(s"__a_$d")) :+ col("__cell").as("__ca")): _*)
    val dominated = keptDf
      .join(broadcast(pairs), col("__cell") === col("__cb"))
      .join(left, Seq("__ca"))
    val geAll = dimCols.map(d => col(s"__a_$d") >= col(d)).reduce(_ && _)
    val gtAny = dimCols.map(d => col(s"__a_$d") > col(d)).reduce(_ || _)
    val dominatedKeys = dominated.where(geAll && gtAny)
      .select(gCols.map(col) ++ dimCols.map(col): _*).distinct()
    keptDf.join(dominatedKeys, (gCols ++ dimCols).toSeq, "left_anti")
      .drop((gCols :+ "__cell"): _*)
  }

  /** Conservative per-partition pre-filter (the MR-BNL local-skyline
    * pass): inside each physical partition a bounded candidate window
    * drops rows some window row beats STRICTLY ON EVERY dimension.
    * Strict-all is deliberately stronger than dominance — through the
    * monotone double cast, strict-all in double implies strict-all in
    * the source type, so no true skyline row is ever dropped (ge-all
    * rounding ambiguity never decides anything); rows arriving after
    * the window fills pass through unfiltered (memory stays bounded,
    * exactness lives in the grid phase). This is what makes the grid
    * phase's pairwise check affordable on bulk data: 10M uniform 3-D
    * rows reduce to ~10³ candidates here, where the raw interacting-
    * cell join would compare ~10¹¹ pairs. Genuine per-partition
    * imperative logic — the same documented mapPartitions seam as
    * next-fit bin packing. */
  private[operators] def localPrune(df: DataFrame, dimCols: Seq[String],
                                    window: Int = 1024): DataFrame = {
    val withDims = df.withColumn("__dims",
      array(dimCols.map(c => col(c).cast("double")): _*))
    val schema = withDims.schema
    val dIdx = schema.fieldIndex("__dims")
    val nd = dimCols.size
    val pruned = withDims.mapPartitions { it =>
      val winDims = new scala.collection.mutable.ArrayBuffer[Array[Double]]()
      val winRows = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
      def strictAll(a: Array[Double], b: Array[Double]): Boolean = {
        var i = 0
        while (i < nd) { if (!(a(i) > b(i))) return false; i += 1 }
        true
      }
      // overflow rows stream straight through (memory stays bounded at
      // `window` buffered rows); the window itself flushes after the
      // input drains — Iterator.++'s by-name right side sees the final
      // window state
      it.flatMap { r =>
        val dims = r.getSeq[Double](dIdx).toArray
        var dead = false
        var i = 0
        while (i < winDims.length && !dead) {
          if (strictAll(winDims(i), dims)) dead = true
          i += 1
        }
        if (dead) None
        else {
          // evict window entries the new row strictly beats
          var j = winDims.length - 1
          while (j >= 0) {
            if (strictAll(dims, winDims(j))) {
              winDims.remove(j); winRows.remove(j)
            }
            j -= 1
          }
          if (winDims.length < window) {
            winDims += dims; winRows += r; None
          } else Some(r)
        }
      } ++ winRows.iterator
    }(org.apache.spark.sql.Encoders.row(schema))
    pruned.drop("__dims")
  }
}
