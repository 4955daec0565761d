package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-column operators for corpus QC and class prototypes.
  *
  * Scale shape: everything here runs posexplode → map-side-combined
  * groupBy on (group, position) — the shuffle carries one partial row
  * per (group, pos) per upstream partition (groups·dim rows), never the
  * vectors themselves.
  */
object Embeddings {

  /** Per-group mean vector (class centroid / prototype), re-assembled in
    * position order: (group, centroid: array<double>, n_vectors). */
  def centroids(df: DataFrame, groupCol: String, vecCol: String): DataFrame =
    df.select(col(groupCol).as("grp"), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy("grp", "pos")
      .agg(avg(col("x").cast("double")).as("m"), count(lit(1)).as("n"))
      .groupBy("grp")
      .agg(
        transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("centroid"),
        max(col("n")).as("n_vectors"))
      .withColumnRenamed("grp", groupCol)

  /** The oracle-exact view of the same aggregation: per (group, pos),
    * Σ floor(x·1000) and the count — each element is quantized ONCE
    * (deterministic per input bits), then integer sums commute exactly,
    * so any SQL engine reproduces the result bit-for-bit, unlike a
    * float mean whose summation order is engine- and partitioning-
    * dependent. mean_milli ≈ sum_milli / cnt. */
  def centroidSumsMilli(df: DataFrame, groupCol: String,
                        vecCol: String): DataFrame =
    df.select(col(groupCol).as("grp"), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy("grp", "pos")
      .agg(sum(floor(col("x").cast("double") * 1000).cast("long"))
        .as("sum_milli"), count(lit(1)).as("cnt"))
      .select(col("grp").as(groupCol), col("pos").cast("long").as("pos"),
        col("sum_milli"), col("cnt"))
}
