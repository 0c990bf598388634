package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus-relative term weighting: per-document term frequencies joined
  * against corpus document frequencies, top-k salient terms per document.
  *
  * The weight is the exact rational tf/df (IEEE double division of two
  * integers — bit-reproducible across engines) rather than the classic
  * tf·ln(N/df): libm `ln` is not guaranteed cross-platform-identical, and
  * for RANKING terms within one document the two orders agree whenever tf
  * ties break by df (ln is monotone in 1/df).
  *
  * Scale shape: two shuffles — (doc, term) partial-aggregated counts
  * (map-side combine absorbs within-doc repetition), then term-keyed df.
  * The df side is vocab-sized, orders of magnitude smaller than the
  * corpus; AQE broadcasts it back when it fits, otherwise the join runs
  * term-partitioned. Nothing is ever collected to the driver.
  */
object TfIdf {

  /** (idCol, term, tf) — one row per distinct term per document. */
  def termCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** Corpus vocabulary: the `topK` most frequent terms that appear in at
    * least `minDf` distinct documents, ranked by total occurrence count
    * (ties broken by term text). `vocab_id` is the 1-based rank — the
    * stable token id a downstream tokenizer ships with the dataset.
    *
    * Scale shape: one (doc, term) partial aggregation (map-side combine
    * absorbs within-doc repetition BEFORE the shuffle — the raw token
    * stream never crosses the wire), one vocab-sized term aggregation,
    * then a global top-k which Spark executes as TakeOrdered (per-partition
    * heaps + driver merge of k rows, never a full sort). The rank window
    * runs on the k surviving rows only. */
  def vocabulary(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minDf: Long,
      topK: Int): DataFrame = {
    val byTerm = termCounts(docs, idCol, textCol)
      .groupBy(col("term"))
      .agg(sum(col("tf")).as("term_freq"), count(lit(1)).as("doc_freq"))
      .filter(col("doc_freq") >= minDf)
      .orderBy(col("term_freq").desc, col("term").asc)
      .limit(topK)
    byTerm
      .withColumn(
        "vocab_id",
        row_number().over(
          Window.orderBy(col("term_freq").desc, col("term").asc)).cast("long"))
      .select(col("vocab_id"), col("term"), col("term_freq"), col("doc_freq"))
  }

  /** Unigram corpus-rarity quality score: for each document, the mean
    * corpus probability of its tokens — the transcendental-free stand-in
    * for unigram-LM perplexity filtering (low `mean_prob` = rare/unusual
    * vocabulary, high = boilerplate built from ubiquitous tokens).
    *
    * mean_prob = (Σ_positions corpus_count(token)) / (n_tokens · total),
    * i.e. the arithmetic mean of p(token) over token positions. Everything
    * up to the final division is exact integer arithmetic, and the single
    * int/int double division is IEEE-identical cross-engine — so the score
    * hash-matches an independent SQL engine bit-for-bit (ln-based
    * surprisal would not: libm `ln` is not cross-platform reproducible).
    *
    * Scale shape: one vocab-keyed aggregation with map-side combine (the
    * raw token stream collapses to (term, count) before the wire), the
    * vocab-sized count table joins back to the exploded stream (AQE
    * broadcasts it when it fits), and the per-doc rollup shuffles on the
    * doc key — all linear. The corpus-total lives in a 1-row frame
    * broadcast into the final projection, never collected to the driver.
    * (n_tokens · total overflows BIGINT once docs × corpus exceed ~9e18
    * token-pairs; past that, compute the division in DECIMAL(38,0).) */
  def tokenRarity(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ex = docs.select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("term"))
    val freq = ex.groupBy(col("term")).agg(count(lit(1)).as("__cnt"))
    val total = freq.agg(sum(col("__cnt")).as("__total"))
    val perDoc = ex
      .join(freq, Seq("term"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("__cnt")).as("sum_freq"))
    docs
      .select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .crossJoin(broadcast(total))
      .select(
        col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("sum_freq"), lit(0L)).as("sum_freq"),
        when(coalesce(col("n_tokens"), lit(0L)) === 0, lit(0.0))
          .otherwise(col("sum_freq").cast("double") /
            (col("n_tokens") * col("__total")).cast("double"))
          .as("mean_prob"))
  }

  /** Top-k terms per document by tf/df weight (ties broken by term text,
    * so the result is fully deterministic). */
  def topTerms(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val tf = termCounts(docs, idCol, textCol)
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(idCol)
      .orderBy(col("score").desc, col("term").asc)
    tf.join(df, "term")
      .withColumn("score", col("tf").cast("double") / col("df").cast("double"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"), col("score"), col("rnk"))
  }

  /** Per-group vocabulary: the `topK` most frequent terms WITHIN each
    * group (a per-language tokenizer vocab), ranked by term count with the
    * term text as tie-break — fully deterministic.
    *
    * Scale shape: the raw token stream collapses to (group, term) counts
    * by map-side combine before the shuffle; the rank-and-filter is the
    * `row_number ≤ k` idiom Spark 3.5+'s `InferWindowGroupLimit` rewrites
    * to a Partial `WindowGroupLimitExec` BELOW the exchange, capping the
    * shuffle at groups × topK per map partition (PlanSpec pins the node).
    * The window route — not [[graft.plans.TopKAgg]] — because the ranked
    * id here is the term STRING and the tie-break must be on its text;
    * the bounded aggregate's id leg is bigint. */
  def groupedVocabulary(
      docs: DataFrame,
      groupCol: String,
      textCol: String,
      topK: Int): DataFrame = {
    // termCounts keyed by the GROUP instead of the document id — same
    // tokenize-explode-aggregate shape, one definition
    val counts = termCounts(docs, groupCol, textCol)
      .withColumnRenamed("tf", "term_freq")
    counts
      .withColumn("rank",
        row_number().over(
          Window.partitionBy(col(groupCol))
            .orderBy(col("term_freq").desc, col("term").asc)).cast("long"))
      .filter(col("rank") <= topK)
  }
}
