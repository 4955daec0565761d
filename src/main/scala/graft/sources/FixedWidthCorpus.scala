package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixed-width (punched-card / mainframe extract / COBOL copybook)
  * ingestion — the third wire format beside [[CsvCorpus]] and
  * [[JsonlCorpus]], still the interchange shape for financial and
  * governmental batch feeds. Same contracts as the csv reader:
  * explicit layout (never inference), PERMISSIVE quarantine with an
  * audit trail, and a single prune-safe scan feeding both branches.
  *
  * Parsing is pure `substring`/`trim` column arithmetic — one
  * whole-stage-codegen projection, no regex, no UDF — so the scan
  * rides at text-source speed at any corpus size.
  *
  * Quarantine triggers (spec-pinned):
  *  - a line whose LENGTH differs from the layout's total width
  *    (truncated or overlong record — the fixed-width analogue of a
  *    token-count-short csv line);
  *  - a numeric field whose trimmed slice does not parse as a long
  *    (blank counts as unparseable: numeric fields are REQUIRED — a
  *    feed with optional numerics should declare the field as text
  *    and cast downstream).
  */
object FixedWidthCorpus {

  /** One field of the layout: 1-based `start`, `width` chars;
    * `numeric` fields are trimmed and cast to long (and REQUIRED),
    * text fields are trimmed strings. */
  final case class Field(name: String, start: Int, width: Int,
                         numeric: Boolean) {
    require(start >= 1, s"start must be 1-based, got $start")
    require(width >= 1, s"width must be >= 1, got $width")
  }

  /** Total record width of a layout (fields must tile it — gaps are
    * allowed, overlaps are the caller's mistake). */
  def recordWidth(fields: Seq[Field]): Int =
    fields.map(f => f.start + f.width - 1).max

  /** Read a fixed-width path against an explicit layout. Returns
    * (clean rows, quarantine — the raw offending lines). */
  def read(spark: SparkSession, path: String,
           fields: Seq[Field]): (DataFrame, DataFrame) = {
    require(fields.nonEmpty, "need at least one field")
    val width = recordWidth(fields)
    def slice(f: Field): Column =
      trim(substring(col("value"), f.start, f.width))
    val lines = spark.read.text(path)
    val badNumeric = fields.filter(_.numeric)
      .map(f => slice(f).cast("long").isNull)
      .foldLeft(lit(false))(_ || _)
    val bad = length(col("value")) =!= width || badNumeric
    val clean = lines.where(!bad)
      .select(fields.map(f =>
        (if (f.numeric) slice(f).cast("long") else slice(f))
          .as(f.name)): _*)
    val quarantine = lines.where(bad).select(col("value").as("raw_line"))
    (clean, quarantine)
  }

  /** Render a relation AS fixed-width lines (the writer side of the
    * round trip): numeric fields right-aligned zero-padded, text
    * fields left-aligned space-padded, each truncated-or-padded to
    * exactly its width. */
  def render(df: DataFrame, fields: Seq[Field]): DataFrame =
    df.select(concat(fields.map { f =>
      val c = col(f.name).cast("string")
      if (f.numeric) lpad(c, f.width, "0")
      else rpad(c, f.width, " ")
    }: _*).as("value"))
}
