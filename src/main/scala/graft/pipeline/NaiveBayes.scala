package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes document classifier — the count-based linear
  * classifier behind fastText-style quality/language filtering in
  * training-data pipelines (label docs with a cheap model, filter or
  * route on the prediction).
  *
  * Training is pure counting (one token explode + vocabulary-sized
  * aggregates), scoring is one join + sum per (doc, class) — no
  * gradient loop, no driver-side state, every stage a standard
  * shuffle-bounded aggregate, so the operator scales like the TF-IDF /
  * LM-fit family it sits next to.
  *
  * Two scoring rules, one plan shape:
  *  - [[fitScores]] / [[classify]]: the GATE-deterministic rule — per
  *    token, the floor-scaled smoothed class-conditional probability
  *    `floor(1e6·(cnt(c,w)+1)/(T_c+V))` is summed per (doc, class) and
  *    added to the floor-scaled prior. Integer arithmetic end to end
  *    (the repo's oracle idiom, see [[TextAnalysis.bigramLmScores]]):
  *    bit-identical in any engine, so the argmax — and therefore the
  *    gate hash — cannot flake on a float ulp.
  *  - [[logScores]]: textbook log-space NB
  *    (`log P(c) + Σ log P(w|c)`), for API users who want the real
  *    posterior ordering; double-valued, spec-covered (NaiveBayesSpec
  *    checks it against a hand-computed fixture), not oracle-hashed.
  *
  * Scale notes: the (label, token) count table is |labels|×vocabulary —
  * joined on (label, tok) at vocabulary scale like TF-IDF's df join (no
  * broadcast by contract; AQE decides). The ≤|labels|-row prior/total
  * tables and the 1-row vocab count ARE broadcast. Scoring multiplies
  * the test token stream |labels|-fold (a bounded, narrow explode), then
  * collapses it with one map-side-combined aggregate.
  */
object NaiveBayes {

  private val SCALE = 1000000L

  /** Per-(test doc, class) integer fit scores. `train` needs (`labelCol`,
    * text); `test` needs (doc_id, text). Output: (doc_id, label,
    * n_tokens, score_x1e6) — one row per test doc per training class,
    * score = floor-scaled prior + Σ_tokens floor-scaled smoothed
    * P(w|c). Add-one smoothing over the training vocabulary V; unseen
    * test tokens contribute the floor of 1e6/(T_c+V) like any other
    * zero-count token. */
  def fitScores(train: DataFrame, test: DataFrame,
                labelCol: String = "label"): DataFrame = {
    val toks = train.select(col(labelCol).as("label"),
      explode(TextAnalysis.tokens(col("text"))).as("tok"))
    val cnt = toks.groupBy("label", "tok").agg(count(lit(1)).as("cnt"))
    val tot = toks.groupBy("label").agg(count(lit(1)).as("t_c"))
    val pri = train.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("n_c"))
    val nTrain = train.agg(count(lit(1)).as("n_train"))
    val vocab = toks.agg(countDistinct(col("tok")).as("v"))

    val perTok = test
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .crossJoin(broadcast(pri.select("label")))
      .join(cnt, Seq("label", "tok"), "left")
      .join(broadcast(tot), Seq("label"))
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"), col("label"),
        expr(s"($SCALE * (coalesce(cnt, 0L) + 1L)) div (t_c + v)")
          .as("p_x1e6"))
    perTok
      .groupBy("doc_id", "label")
      .agg(count(lit(1)).as("n_tokens"), sum("p_x1e6").as("sum_p_x1e6"))
      .join(broadcast(pri), Seq("label"))
      .crossJoin(broadcast(nTrain))
      .select(col("doc_id"), col("label"), col("n_tokens"),
        (expr(s"($SCALE * n_c) div n_train") + col("sum_p_x1e6"))
          .as("score_x1e6"))
  }

  /** Predicted class per test doc: argmax of [[fitScores]] with ties to
    * the smallest label string (deterministic). Output: (doc_id,
    * pred_label, score_x1e6). The rank window partitions by doc_id over
    * |labels| rows — never a corpus-sized sort. */
  def classify(train: DataFrame, test: DataFrame,
               labelCol: String = "label"): DataFrame = {
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score_x1e6").desc, col("label"))
    fitScores(train, test, labelCol)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("doc_id"), col("label").as("pred_label"), col("score_x1e6"))
  }

  /** Textbook log-space NB scores: (doc_id, label, log_score) with
    * log_score = ln(N_c/N) + Σ ln((cnt+1)/(T_c+V)). Same plan shape as
    * [[fitScores]]; double-valued, for API use (see class doc). */
  def logScores(train: DataFrame, test: DataFrame,
                labelCol: String = "label"): DataFrame = {
    val toks = train.select(col(labelCol).as("label"),
      explode(TextAnalysis.tokens(col("text"))).as("tok"))
    val cnt = toks.groupBy("label", "tok").agg(count(lit(1)).as("cnt"))
    val tot = toks.groupBy("label").agg(count(lit(1)).as("t_c"))
    val pri = train.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("n_c"))
    val nTrain = train.agg(count(lit(1)).as("n_train"))
    val vocab = toks.agg(countDistinct(col("tok")).as("v"))
    test
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .crossJoin(broadcast(pri.select("label")))
      .join(cnt, Seq("label", "tok"), "left")
      .join(broadcast(tot), Seq("label"))
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"), col("label"),
        log((coalesce(col("cnt"), lit(0L)) + lit(1L)).cast("double") /
          (col("t_c") + col("v")).cast("double")).as("lp"))
      .groupBy("doc_id", "label")
      .agg(sum("lp").as("sum_lp"))
      .join(broadcast(pri), Seq("label"))
      .crossJoin(broadcast(nTrain))
      .select(col("doc_id"), col("label"),
        (log(col("n_c").cast("double") / col("n_train").cast("double")) +
          col("sum_lp")).as("log_score"))
  }
}
