package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.query.TopKAggregator

/** Bounded top-k rows PER GROUP — "the 3 longest documents per source",
  * "the 10 highest-scoring candidates per query" — as a real aggregate
  * instead of a window.
  *
  * The textbook formulation, `row_number() OVER (PARTITION BY g ORDER BY
  * v) <= k`, shuffles EVERY row to its group's partition and sorts the
  * whole group just to keep k rows — at 100 TB with heavy groups that is
  * the whole corpus through one exchange plus an n·log n sort per group.
  * This operator reuses the map-side-combinable [[TopKAggregator]]
  * (batch k-NN's bounded top-k): each task keeps at most k candidates
  * per group, so the shuffle carries ≤ k·|groups| fixed-width rows no
  * matter how large the groups are, and nothing is ever globally sorted.
  *
  * Values are compared as doubles (exact for integer-valued columns up
  * to 2⁵³); ties break toward the smaller id, matching the
  * `ORDER BY v DESC, id` window convention.
  */
object GroupedTopK {

  /** Top-k ids per group by `valueCol` (descending by default; ties by
    * ascending id). Output: (groupCol, rank: long 1..k, idCol: long,
    * valueCol: double). */
  def topPerGroup(df: DataFrame, groupCol: String, valueCol: String,
                  idCol: String, k: Int,
                  descending: Boolean = true): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val v = col(valueCol).cast("double")
    val key = if (descending) -v else v
    df.groupBy(col(groupCol))
      .agg(TopKAggregator.topK(k)(key, col(idCol).cast("long")).as("hits"))
      .select(col(groupCol), posexplode(col("hits")))
      .select(col(groupCol),
        (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as(idCol),
        (if (descending) -col("col.dist") else col("col.dist")).as(valueCol))
  }
}
