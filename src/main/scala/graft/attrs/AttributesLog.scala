package graft.attrs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Attribute storage as a replay log with last-write-wins semantics —
  * the reference's `AttributesLog` of `OperationSetAttribute` entries
  * (reference/protos/database.proto:96-115; replay loop
  * reference/src/db/stored.rs:210-250).
  *
  * Long format: (entity_id, name, value..., seq). The resolver is a
  * single window/aggregation; at scale it shuffles once on
  * (entity_id, name) — and since lookups after an ANN query touch only
  * k ≪ n entities, [[resolveFor]] semi-joins the log down to the hit set
  * before resolving, the analogue of the reference loading only the hit
  * partitions' logs (db/stored.rs:625-638).
  */
object AttributesLog {

  /** Last-write-wins resolution: keep the row with the highest sequence
    * (compared over `seqCols` in order, descending) per key. The reference
    * cannot tie — seq is the log position — so callers should include a
    * unique final seq column for determinism. */
  def resolve(log: DataFrame, keyCols: Seq[String], seqCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(seqCols.map(c => col(c).desc): _*)
    log.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** Resolve only the attributes of entities present in `hits(idCol)` —
    * broadcast semi-join first, so the window runs over k·names rows, not
    * the whole log. */
  def resolveFor(log: DataFrame, hits: DataFrame, idCol: String,
                 keyCols: Seq[String], seqCols: Seq[String]): DataFrame =
    resolve(log.join(broadcast(hits.select(idCol).distinct()), idCol),
      keyCols, seqCols)
}
