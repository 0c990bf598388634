package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{CandidateCapExceededException, Similarity}

/** SemDeDup scale-demonstration rows for the decade-rehearsal artifact
  * (VERDICT r11 #1): the r11 sf10 findings — unscaled fixture-k SemDeDup
  * trips the scale-relative guard FAST instead of burning 600 s, and the
  * paper-contract scaled k (k ∝ N) completes — exist as committed,
  * re-runnable measurements instead of SURVEY prose.
  *
  * Two rows over `<sfDir>/embeddings.parquet`:
  *   1. `semdedup_unscaled_k` — q116's exact call (kClusters = 8,
  *      maxPairsPerVector = 4096): at sf10's 200k vectors the
  *      within-cluster pair mass is ~12.5k pairs/vector, so the expected
  *      outcome is a DRIVER-SIDE `CandidateCapExceededException` in
  *      seconds (the guard is one k-row aggregation) — `wall_sec` here
  *      measures time-to-refusal, the cluster-burn these guards buy off.
  *   2. `semdedup_scaled_k` — the production shape (kClusters scaled so
  *      pairs/vector stays under the same cap; k = 64 at sf10 per the
  *      r11 rehearsal ≈ 1.6k pairs/vector), run to completion with the
  *      drop counts recorded.
  *
  * Usage: runMain graft.ScaleDemo <sfDir> <outPath> [scaledK]
  */
object ScaleDemo {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outPath = args(1)
    val scaledK = if (args.length > 2) args(2).toInt else 64
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    Graft.prepare(spark)
    spark.sparkContext.setLogLevel("WARN")

    val emb = Tables.embeddings(spark, sfDir)
    val nVec = emb.count()

    def j(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    // Full JSON string escaping (quote, backslash, control chars): the
    // artifact must stay machine-parseable whatever a future guard
    // message or an exotic sfDir path contains.
    def esc(s: String): String = {
      val sb = new java.lang.StringBuilder(s.length + 8)
      s.foreach {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case c if c < ' ' =>
          sb.append(String.format(java.util.Locale.ROOT, "\\u%04x", Integer.valueOf(c.toInt)))
        case c => sb.append(c)
      }
      sb.toString
    }

    // Each row records EITHER outcome: a completion with drop counts, or
    // a driver-side guard trip with the exception's message — so the
    // artifact is always written even when a row refuses (the refusal IS
    // the measurement).
    def semDedupRow(k: Int): (String, Double) = {
      val t0 = System.nanoTime()
      val body =
        try {
          val dropped = Similarity.semDedup(emb, "vec_id", "embedding",
              threshold = 0.35, kClusters = k, iters = 1,
              maxPairsPerVector = 4096L)
            .agg(sum(when(col("dropped"), 1L).otherwise(0L))).collect()(0).getLong(0)
          s""""outcome":"completed","n_dropped":$dropped"""
        } catch {
          case e: CandidateCapExceededException =>
            s""""outcome":"guard_trip","exception":"CandidateCapExceededException","message":"${esc(e.getMessage)}""""
          // Any OTHER failure (OOM-adjacent Spark job error, bad input)
          // must not abort the main before the artifact lands — the doc's
          // "artifact is always written" contract covers the sibling row's
          // measurement too (ADVICE r12).
          case scala.util.control.NonFatal(e) =>
            s""""outcome":"error","exception":"${esc(e.getClass.getName)}","message":"${esc(String.valueOf(e.getMessage))}""""
        }
      (body, (System.nanoTime() - t0) / 1e9)
    }

    // Row 1: q116's exact parameters. Outcome is data-dependent — at gate
    // SF / sf1 it completes (pairs/vector under the cap); at sf10 it must
    // trip. Row 2: the k ∝ N production shape under the SAME cap.
    val (unscaled, unscaledSec) = semDedupRow(8)
    val (scaled, scaledSec) = semDedupRow(scaledK)

    val json =
      s"""{"sf":"${esc(sfDir)}","n_vectors":$nVec,
         |"semdedup_unscaled_k":{"k_clusters":8,"max_pairs_per_vector":4096,"wall_sec":${j(unscaledSec)},$unscaled},
         |"semdedup_scaled_k":{"k_clusters":$scaledK,"max_pairs_per_vector":4096,"wall_sec":${j(scaledSec)},$scaled}}"""
        .stripMargin.replace("\n", "")
    println(json)
    val p = java.nio.file.Paths.get(outPath)
    val parent = p.toAbsolutePath.getParent
    if (parent != null) java.nio.file.Files.createDirectories(parent)
    java.nio.file.Files.writeString(p, json + "\n")
    System.err.println(s"[scale-demo] wrote $p")
    spark.stop()
  }
}
