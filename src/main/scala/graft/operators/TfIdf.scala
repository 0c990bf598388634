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
}
