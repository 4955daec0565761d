package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture between two snapshots of a keyed table: which
  * keys were inserted, deleted, or updated — the primitive behind
  * incremental pipeline refresh ("re-embed only the documents that
  * changed since the last index build") and snapshot reconciliation.
  *
  * Shape: ONE full-outer sort-merge join on the key columns plus a
  * null-safe column compare — no window, no driver state, no second
  * pass. At 100 TB both snapshots shuffle once on the key; if the
  * snapshots are written bucketed by the key (sources/BucketedTables),
  * the exchange disappears entirely and the diff is a zero-shuffle
  * zip of co-located buckets. Unchanged rows are dropped before
  * anything leaves the join, so the output is |changes|, not |table|.
  */
object SnapshotDiff {

  /** The diff plan synthesizes `old_<col>`/`new_<col>` renames plus
    * `in_old`/`in_new`/`change` markers; an input column matching one of
    * those would resolve ambiguously (e.g. a key named `old_x` next to a
    * value column `x`, or a key named `change`). Refuse loudly up front
    * instead of letting Catalyst throw an opaque ambiguous-reference —
    * or worse, silently overwrite a user column. */
  private def requireNoReservedColumns(df: DataFrame, op: String): Unit = {
    val reserved = df.columns.filter(c =>
      c == "in_old" || c == "in_new" || c == "change" ||
        c.startsWith("old_") || c.startsWith("new_"))
    require(reserved.isEmpty,
      s"SnapshotDiff.$op reserves column names in_old/in_new/change and " +
        s"prefixes old_/new_ for its internal join markers; rename input " +
        s"column(s) ${reserved.mkString(", ")} before diffing")
  }

  /** Rows whose key set or value columns differ between `old` and `cur`.
    *
    * Both inputs must share a schema; every non-key column participates
    * in the update check with null-safe semantics (`<=>`: a null→value
    * or value→null transition is an update, null→null is not). Output:
    * the key columns plus `change` ∈ {'insert','delete','update'} —
    * inserts are keys only in `cur`, deletes only in `old`. Unchanged
    * keys are filtered out inside the join projection. */
  def diff(old: DataFrame, cur: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "diff needs at least one key column")
    requireNoReservedColumns(cur, "diff")
    require(old.columns.sorted.sameElements(cur.columns.sorted),
      s"snapshot schemas differ: ${old.columns.mkString(",")} vs ${cur.columns.mkString(",")}")
    val valCols = cur.columns.filterNot(keys.contains).toSeq
    val o = old.select(keys.map(col) ++ valCols.map(c => col(c).as(s"old_$c")): _*)
      .withColumn("in_old", lit(true))
    val n = cur.select(keys.map(col) ++ valCols.map(c => col(c).as(s"new_$c")): _*)
      .withColumn("in_new", lit(true))
    val changed = valCols
      .map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    o.join(n, keys, "full_outer")
      .withColumn("change",
        when(col("in_old").isNull, "insert")
          .when(col("in_new").isNull, "delete")
          .when(changed, "update"))
      .where(col("change").isNotNull)
      .select(keys.map(col) :+ col("change"): _*)
  }

  /** [[diff]] carrying the PAYLOAD: inserts and updates bring the new
    * row's value columns (deletes carry nulls), so the output is a
    * self-contained change set [[applyChanges]] can replay — the
    * extract side of incremental snapshot maintenance. Same join, same
    * classification, one more projection. */
  def diffRows(old: DataFrame, cur: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "diffRows needs at least one key column")
    requireNoReservedColumns(cur, "diffRows")
    require(old.columns.sorted.sameElements(cur.columns.sorted),
      s"snapshot schemas differ: ${old.columns.mkString(",")} vs ${cur.columns.mkString(",")}")
    val valCols = cur.columns.filterNot(keys.contains).toSeq
    val o = old.select(keys.map(col) ++ valCols.map(c => col(c).as(s"old_$c")): _*)
      .withColumn("in_old", lit(true))
    val n = cur.select(keys.map(col) ++ valCols.map(c => col(c).as(s"new_$c")): _*)
      .withColumn("in_new", lit(true))
    val changed = valCols
      .map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    o.join(n, keys, "full_outer")
      .withColumn("change",
        when(col("in_old").isNull, "insert")
          .when(col("in_new").isNull, "delete")
          .when(changed, "update"))
      .where(col("change").isNotNull)
      .select(keys.map(col) ++ valCols.map(c => col(s"new_$c").as(c))
        :+ col("change"): _*)
  }

  /** MERGE: replay a [[diffRows]] change set onto a snapshot —
    * `apply(v1, diffRows(v1, v2)) == v2` exactly (the spec and the
    * driver gate assert the round trip). Deleted and updated keys leave
    * via one anti-join (changes are \|changes\|-sized — broadcastable
    * in the common case, still just a keyed shuffle otherwise); insert
    * and update rows come back with a union. No window, no driver
    * state — the same shape Delta/Iceberg MERGE lowers to. */
  def applyChanges(old: DataFrame, changes: DataFrame,
                   keys: Seq[String]): DataFrame = {
    val kept = old.join(changes.select(keys.map(col): _*), keys, "left_anti")
    kept.unionByName(
      changes.where(col("change") =!= "delete").drop("change"))
  }
}
