package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off stage probe for Dedup.containmentPairs at a given sf dir. */
object ContainProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val t = if (args.length > 1) args(1).toInt else 80
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, dir).cache()
    docs.count()
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    import graft.pipeline.Dedup
    // replicate the internals for stage-level visibility
    val sets = Dedup.hashedSets(docs)
    val groups = time("identical-groups") {
      val g = sets.groupBy("hset")
        .agg(min(col("doc_id")).as("rep"),
          array_sort(collect_list(col("doc_id"))).as("members"),
          first(col("sz")).as("sz")).localCheckpoint()
      println(s"[probe]   groups=${g.count()}")
      g
    }
    val reps = groups.select(col("rep").as("doc_id"), col("hset"), col("sz"))
      .localCheckpoint()
    println(s"[probe]   reps=${reps.count()} of docs=${docs.count()}")
    val toks = reps.select(col("doc_id"), col("sz"),
      explode(col("hset")).as("h"))
    val dfreq = toks.groupBy("h").agg(count(lit(1)).as("df"))
    val prefixed = time("prefix-build") {
      val p = toks.join(dfreq, "h")
        .groupBy(col("doc_id"), col("sz"))
        .agg(array_sort(collect_list(struct(col("df"), col("h")))).as("ranked"))
        .select(col("doc_id"), col("sz"),
          transform(slice(col("ranked"), lit(1),
            (col("sz") - floor((col("sz") * t + lit(99)) / 100) + 1).cast("int")),
            s => s.getField("h")).as("prefix"))
        .localCheckpoint()
      println(s"[probe]   prefix rows=${p.count()}")
      p
    }
    val aSide = prefixed.select(col("doc_id").as("a_id"), col("sz").as("a_sz"),
      explode(col("prefix")).as("h"))
    val bSide = toks.select(col("doc_id").as("b_id"), col("sz").as("b_sz"), col("h"))
    println(s"[probe]   aSide=${aSide.count()} bSide=${bSide.count()}")
    val candMulti = aSide.join(bSide, Seq("h"))
      .where(col("a_id") =!= col("b_id") &&
        col("b_sz") * 100 >= col("a_sz") * t)
    time("cand-multiset-count") {
      println(s"[probe]   cand multiset=${candMulti.count()}")
    }
    val cand = candMulti.groupBy(col("a_id"), col("b_id"))
      .agg(first(col("a_sz")).as("a_sz"))
    time("cand-distinct") {
      println(s"[probe]   cand distinct=${cand.count()}")
    }
    time("full-containment") {
      println(s"[probe]   pairs=${Dedup.containmentPairs(docs, t).count()}")
    }
    time("full-containment-shingled") {
      println(s"[probe]   sh-pairs=" +
        Dedup.containmentPairsShingled(docs, t, 3).count())
    }
    spark.stop()
  }
}
