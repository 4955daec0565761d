package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Declarative data-quality expectations (the dbt-test / Great-
  * Expectations shape): a rule set validated against a relation in as
  * few passes as the rule mix allows, yielding one (rule, n_violations)
  * row per rule — the contract gate a 100 TB ingest runs before
  * publishing a batch.
  *
  * Plan shape by rule kind:
  *  - row-local rules ([[NotNull]], [[InRange]], [[Accepted]]) fold into
  *    ONE whole-relation aggregate — a single codegen scan computes every
  *    `sum(when(...))` counter at once, however many rules there are;
  *  - [[Unique]] is one key-sized groupBy per key set (violations =
  *    rows − distinct keys, so the shuffle carries key groups, never
  *    row payloads);
  *  - [[RefersTo]] is one left-anti join per reference (broadcast or
  *    shuffle by AQE's choice; compose with
  *    [[BloomJoin]] manually when the reference side is huge).
  *
  * NULL semantics (identical in Spark and ANSI SQL): a NULL value never
  * violates InRange/Accepted — comparisons yield NULL which counts as
  * pass; nullability is [[NotNull]]'s job, so the two concerns compose
  * without double-counting. A NULL foreign key DOES count as a
  * [[RefersTo]] violation (anti-join semantics: NULL matches nothing).
  */
object Expectations {

  sealed trait Rule { def name: String }
  /** `column` must be non-NULL. */
  final case class NotNull(column: String) extends Rule {
    def name = s"not_null:$column"
  }
  /** `columns` must be a unique key. Violations = rows − distinct keys
    * (0 when unique), so every duplicated row beyond its group's first
    * counts once. */
  final case class Unique(columns: Seq[String]) extends Rule {
    def name = s"unique:${columns.mkString(",")}"
  }
  /** `column` must lie in [lo, hi] when non-NULL. */
  final case class InRange(column: String, lo: Double, hi: Double) extends Rule {
    def name = s"in_range:$column"
  }
  /** `column` must be one of `values` when non-NULL. */
  final case class Accepted(column: String, values: Seq[String]) extends Rule {
    def name = s"accepted:$column"
  }
  /** Distribution-level rule: the exact discrete qX100-th percentile of
    * a long column (the [[graft.pipeline.Sketches.exactQuantiles]] rank
    * rule) must be ≤ `bound` — the "p99 latency under X" / "p95 doc
    * length under Y" gate shape. One domain-sized histogram aggregate
    * per rule; reports 0 or 1 violations (it is a property of the
    * distribution, not of rows). Vacuously passes on empty input, like
    * the row-local rules. */
  final case class QuantileAtMost(column: String, qX100: Int,
                                  bound: Long) extends Rule {
    require(qX100 >= 1 && qX100 <= 100,
      s"qX100 must be in 1..100, got $qX100")
    def name = s"quantile_at_most:$column:p$qX100"
  }

  /** Order-level rule: `column` must be non-decreasing along
    * `orderCol` within each `keyCols` group — the watermark/sequence
    * sanity gate (event time never runs backwards per user, balances
    * never regress per account snapshot). A violation is an ADJACENT
    * INVERSION: prev value > value in the (orderCol, column)-ordered
    * group walk; ties in `orderCol` are never violations (equal-order
    * rows may arrive in any order, so the walk sorts them by value).
    * NULL values never violate (nullability is [[NotNull]]'s job).
    * One bounded window pass per rule (partitioned by the key — keep
    * `keyCols` non-empty at scale; empty keys mean one global sort). */
  final case class NonDecreasing(column: String, orderCol: String,
                                 keyCols: Seq[String]) extends Rule {
    def name = s"non_decreasing:$column:by:$orderCol"
  }

  /** `column` must exist in `ref(refColumn)` (referential integrity). */
  final case class RefersTo(column: String, ref: DataFrame,
                            refColumn: String) extends Rule {
    def name = s"refers_to:$column"
  }

  /** Violation counts per rule: (rule, n_violations), one row per rule,
    * sorted by rule name. An empty relation yields 0 for every rule. */
  def violations(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "Expectations.violations: empty rule set")
    require(rules.map(_.name).distinct.size == rules.size,
      "Expectations.violations: duplicate rule names")
    val rowLocal = rules.collect {
      case r: NotNull =>
        r.name -> when(col(r.column).isNull, 1L).otherwise(0L)
      case r: InRange =>
        r.name -> when(col(r.column) < r.lo || col(r.column) > r.hi, 1L)
          .otherwise(0L)
      case r: Accepted =>
        r.name -> when(!col(r.column).isin(r.values: _*), 1L).otherwise(0L)
    }
    val scanned: Seq[DataFrame] =
      if (rowLocal.isEmpty) Nil
      else {
        val agg = df.agg(
          coalesce(sum(rowLocal.head._2), lit(0L)).as("c0"),
          rowLocal.tail.zipWithIndex.map { case ((_, c), i) =>
            coalesce(sum(c), lit(0L)).as(s"c${i + 1}")
          }: _*)
        Seq(agg.select(explode(array(rowLocal.zipWithIndex.map {
          case ((name, _), i) => struct(lit(name).as("rule"),
            col(s"c$i").as("n_violations"))
        }: _*)).as("kv")).select(col("kv.rule"), col("kv.n_violations")))
      }
    val keyed = rules.collect { case r: Unique =>
      df.groupBy(r.columns.map(col): _*).agg(count(lit(1)).as("c"))
        .agg(coalesce(sum(col("c") - 1), lit(0L)).as("n_violations"))
        .select(lit(r.name).as("rule"), col("n_violations"))
    }
    val referential = rules.collect { case r: RefersTo =>
      df.join(r.ref, df(r.column) === r.ref(r.refColumn), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
        .select(lit(r.name).as("rule"), col("n_violations"))
    }
    val ordered = rules.collect { case r: NonDecreasing =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(r.keyCols.map(col): _*)
        .orderBy(col(r.orderCol), col("__v"))
      df.select((r.keyCols.map(col) :+ col(r.orderCol)) :+
          col(r.column).as("__v"): _*)
        .withColumn("__prev", lag(col("__v"), 1).over(w))
        .agg(coalesce(sum(when(col("__prev") > col("__v"), 1L)
          .otherwise(0L)), lit(0L)).as("n_violations"))
        .select(lit(r.name).as("rule"), col("n_violations"))
    }
    val distributional = rules.collect { case r: QuantileAtMost =>
      graft.pipeline.Sketches
        .exactQuantiles(df.select(col(r.column)), r.column, Seq(r.qX100))
        .agg(coalesce(sum(when(col("value") > r.bound, 1L)
          .otherwise(0L)), lit(0L)).as("n_violations"))
        .select(lit(r.name).as("rule"), col("n_violations"))
    }
    (scanned ++ keyed ++ referential ++ ordered ++ distributional)
      .reduce(_ unionByName _)
      .orderBy("rule")
  }

  /** Assert-style wrapper: returns the input unchanged when every rule
    * passes, otherwise fails loudly with the per-rule counts — the
    * publish-gate form (`validated(df, rules).write...`). Runs the
    * validation eagerly (one action over the counts; the returned plan
    * re-reads `df` untouched). */
  /** STREAMING publish gate: validate EVERY micro-batch against the
    * rule set before handing it to the sink — foreachBatch around
    * [[validated]], the same sink shape as
    * [[graft.streaming.StreamingIngest]]. Rule scope is PER BATCH:
    * [[Unique]] checks uniqueness within the arriving batch
    * (cross-batch keys need a stateful dedup upstream — see
    * [[graft.streaming.EventPipeline.dedupStream]]); [[RefersTo]]
    * joins each batch against its (static) reference. A failing batch
    * fails the QUERY loudly with the per-rule counts and nothing of
    * that batch reaches the sink. */
  def validatedStream(stream: DataFrame, rules: Seq[Rule],
                      sink: (DataFrame, Long) => Unit,
                      checkpoint: Option[String] = None): StreamingQuery = {
    val w = stream.writeStream
    checkpoint.foreach(c => w.option("checkpointLocation", c))
    w.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      sink(validated(batch, rules), batchId)
      ()
    }.start()
  }

  def validated(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val bad = violations(df, rules)
      .where(col("n_violations") > 0)
      .collect() // ≤ |rules| rows by construction
    if (bad.nonEmpty) {
      val detail = bad.map(r => s"${r.getString(0)}=${r.getLong(1)}")
        .mkString(", ")
      throw new IllegalStateException(
        s"Expectations failed: $detail")
    }
    df
  }
}
