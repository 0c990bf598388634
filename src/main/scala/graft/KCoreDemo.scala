package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Centrality

/** q148 spill counter-row generator (VERDICT r12 #2): the committed sf10
  * bench row for q148 (30-core of the τ=9/10 UNIGRAM similarity graph)
  * carries 53.9 GB disk / 238 GB memory spill in the verify sort —
  * adjudicated in `Dedup.prefixFilterJaccardJoin`'s scaladoc as
  * output-bound on the deliberately-dense 31-token unigram fixture
  * vocabulary, with "use shingles" as the documented production answer.
  * That adjudication rested on prose; this main converts it to a committed
  * measurement: the SAME k-core shape (same τ, same cap, same k) run
  * twice over the same corpus —
  *
  *   1. `kcore_unigram` — q148's exact call (`shingleK = 1`,
  *      `maxPairsPerEntry = 8192`): token sets drawn from a ~31-token/copy
  *      vocabulary, so nearly every document pair shares most tokens and
  *      the candidate/verify mass is inherently ~quadratic-dense — the
  *      fixture makes the graph dense ON PURPOSE (the k-core needs peel
  *      structure);
  *   2. `kcore_shingle` — `shingleK = 3`, everything else identical: the
  *      production representation, where candidate mass is proportional
  *      to TRUE near-duplication instead of vocabulary collision.
  *
  * Each row records wall seconds, core size, and the [[MetricsListener]]
  * execution datasheet (spill bytes, task skew, hot-stage tail) keyed by
  * a per-row job group. Expected outcome at sf10: the shingle row's
  * verify-sort spill collapses from tens of GB to ~zero while the unigram
  * row reproduces the committed q148 numbers — the measured form of "the
  * spill is the fixture's density, not the operator's plan".
  *
  * Usage: runMain graft.KCoreDemo <sfDir> <outPath> [--skip-unigram]
  */
object KCoreDemo {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outPath = args(1)
    val skipUnigram = args.contains("--skip-unigram")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    Graft.prepare(spark)
    spark.sparkContext.setLogLevel("WARN")

    val metrics = new graft.pipeline.MetricsListener
    spark.sparkContext.addSparkListener(metrics)

    def j(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
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
    // The listener bus is async — poll until the task count stabilizes
    // before reading a row's datasheet (the Bench drain convention).
    def drain(): Unit = {
      var seen = -1L
      var stable = 0
      val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
      while (stable < 3 && System.nanoTime() < deadline) {
        Thread.sleep(200)
        val now = metrics.totalTasksSeen()
        if (now == seen) stable += 1 else { stable = 0; seen = now }
      }
    }

    // q148's exact call, parameterized only by shingleK. The count() is
    // the execution (node+degree output, nothing prunable); NonFatal is
    // recorded rather than thrown so one row's failure cannot lose the
    // other's measurement (the ScaleDemo contract).
    def row(name: String, shingleK: Int): String = {
      val group = s"kcore-demo-$name"
      val t0 = System.nanoTime()
      val body =
        try {
          spark.sparkContext.setJobGroup(group, name, interruptOnCancel = true)
          val core = Centrality.kCore(
            operators.Dedup.prefixFilterJaccardJoin(
              Tables.documents(spark, sfDir), "doc_id", "text",
              tauNum = 9, tauDen = 10, shingleK = shingleK,
              maxPairsPerEntry = 8192L),
            "doc_a", "doc_b", k = 30, inputCanonical = true)
          val n = core.count()
          s""""outcome":"completed","n_core_nodes":$n"""
        } catch {
          case scala.util.control.NonFatal(e) =>
            s""""outcome":"error","exception":"${esc(e.getClass.getName)}","message":"${esc(String.valueOf(e.getMessage))}""""
        } finally spark.sparkContext.clearJobGroup()
      val wall = (System.nanoTime() - t0) / 1e9
      drain()
      val sheet = metrics.groupJson(group).getOrElse("{}")
      s""""$name":{"shingle_k":$shingleK,"tau":"9/10","k_core":30,"max_pairs_per_entry":8192,"wall_sec":${j(wall)},$body,"metrics":$sheet}"""
    }

    val rows = Seq(
      if (skipUnigram) None else Some(row("kcore_unigram", 1)),
      Some(row("kcore_shingle", 3))).flatten

    val json = s"""{"sf":"${esc(sfDir)}",${rows.mkString(",")}}"""
    println(json)
    val p = java.nio.file.Paths.get(outPath)
    val parent = p.toAbsolutePath.getParent
    if (parent != null) java.nio.file.Files.createDirectories(parent)
    java.nio.file.Files.writeString(p, json + "\n")
    System.err.println(s"[kcore-demo] wrote $p")
    spark.stop()
  }
}
