package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Document chunking: cut each document's token sequence into fixed-size
  * overlapping windows (`window` tokens, advancing by `stride`) — the
  * context-window / RAG-passage shape.
  *
  * Per-row generate-and-explode, no shuffle: the chunk count and every
  * chunk's slice are array expressions over the tokenized text, so the op
  * maps over 100 TB of documents at scan speed and chunk rows stream
  * straight into the next stage without ever materializing a corpus-wide
  * token stream. Chunk identity is (doc_id, chunk_idx); `chunk_fp` (md5 of
  * the space-joined window) gives chunk-level dedup a key for free.
  */
object Chunking {

  def chunkWindows(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      window: Int,
      stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      "need 0 < stride <= window")
    docs
      .withColumn("__toks", TextFunctions.tokens(col(textCol)))
      .withColumn("__n", size(col("__toks")).cast("long"))
      // windows covering n tokens: 0 for empty docs, else 1 + ceil((n-window)/stride)
      // (the last window may be short). Integer `div`, not `/` (double).
      .withColumn("__nc", expr(
        s"CASE WHEN __n <= 0 THEN 0L WHEN __n <= $window THEN 1L" +
          s" ELSE (__n - $window + ${stride - 1}) div ${stride}L + 1L END"))
      .select(
        col(idCol),
        col("__toks"),
        // empty array (not sequence(0,-1) — Spark would count DOWN) for
        // 0-chunk docs; stepped sequence, NOT transform(seq, i => i*stride):
        // exploding a higher-order-function array is CodegenFallback and
        // knocks the generate out of whole-stage codegen
        posexplode(when(col("__nc") === 0, array().cast("array<bigint>"))
          .otherwise(sequence(
            lit(0L), (col("__nc") - 1) * stride, lit(stride.toLong))))
          .as(Seq("__pos", "start_tok")))
      .select(
        col(idCol),
        col("__pos").cast("long").as("chunk_idx"),
        col("start_tok"),
        slice(col("__toks"), (col("start_tok") + 1).cast("int"), lit(window)).as("__chunk"))
      .select(
        col(idCol),
        col("chunk_idx"),
        col("start_tok"),
        size(col("__chunk")).cast("long").as("n_chunk_tokens"),
        md5(concat_ws(" ", col("__chunk")).cast("binary")).as("chunk_fp"))
  }
}
