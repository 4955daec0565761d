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
}
