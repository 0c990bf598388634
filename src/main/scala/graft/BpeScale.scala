package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.BpeTrainer

/** BPE scale rehearsal: train the tokenizer at PRODUCTION merge counts
  * on a real scale factor and record the claims the gate's 6-merge rows
  * (q188/q189) cannot check:
  *
  *  - **rounds ≈ nMerges / batchSize** — the top-B symbol-disjoint
  *    batching contract (conflict skips may stretch it; a tiny symbol
  *    space stretches it hardest, which the word-tier run demonstrates);
  *  - **exhaustion stops cleanly** — the synthetic corpus's [a-z]+ word
  *    vocabulary is a few hundred words, so word-tier training EXHAUSTS
  *    (every word one symbol) well before a production merge count: the
  *    early-stop path runs at scale, recorded as merges < requested;
  *  - **≥ 1,000 merges at realistic vocabulary size** — the bigram tier
  *    (adjacent word pairs as training units, space in the symbol
  *    alphabet) lifts the vocabulary to production shape so the batching
  *    claim is tested where it matters;
  *  - **encode stays ONE BpeMergeFold expression** at any table size (the
  *    merge table ships as reference objects — counted in the executed
  *    plan, not assumed);
  *  - **encode wall grows SUB-linearly in merge count** — the kernel
  *    walks merges × current length and the buffer shrinks as early
  *    merges collapse words, so 4× the table must cost well under 4× the
  *    wall (measured on the corpus word stream, the production shape).
  *
  * Usage: `runMain graft.BpeScale [sfDir] [nMerges] [batchSize]`.
  * Prints one JSON line and writes it to `SPARK_GRAFT_BPE_OUT`
  * (default `bpe_scale.json` in the cwd). The committed sf1 record is
  * `BPE_SCALE_sf1.json`.
  */
object BpeScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val nMerges = args.lift(1).map(_.toInt).getOrElse(1000)
    val batch = args.lift(2).map(_.toInt).getOrElse(64)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    Graft.prepare(spark)
    spark.sparkContext.setLogLevel("WARN")

    def secs[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val docs = Tables.documents(spark, sfDir)

    // Bigram training units: adjacent word pairs, space in the symbol
    // alphabet — same algorithm, production-sized vocabulary.
    def bigramVocab: DataFrame = {
      val toks = docs.select(TextFunctions.tokens(lower(col("text"))).as("t"))
      toks
        .select(explode(zip_with(
          col("t"),
          slice(col("t"), lit(2), greatest(size(col("t")) - 1, lit(0))),
          (a, b) => concat_ws(" ", a, b))).as("word"))
        .filter(col("word").rlike("^[a-z]+ [a-z]+$"))
        .groupBy(col("word"))
        .agg(count(lit(1)).as("freq"))
    }

    // Corpus word stream for encode timing (production shape: one row per
    // occurrence), checkpointed so scan+tokenize cost is excluded.
    val corpusWords = docs
      .select(explode(TextFunctions.tokens(lower(col("text")))).as("word"))
      .filter(col("word").rlike("^[a-z]+$"))
      .withColumn("freq", lit(1L))
      .localCheckpoint()
    val nWords = corpusWords.count()

    def run(tier: String, vocab: DataFrame): String = {
      val v = vocab.localCheckpoint()
      val vocabSize = v.count()
      val ((merges, _, rounds), trainSec) =
        secs(BpeTrainer.trainRounds(v, nMerges, batchSize = batch))
      def encodeSec(tbl: Seq[BpeTrainer.Merge]): Double =
        secs(BpeTrainer.encodeVocab(corpusWords, tbl)
          .write.format("noop").mode("overwrite").save())._2
      encodeSec(merges.take(16)) // JIT/codegen warm-up, not recorded
      val encQuarter = encodeSec(merges.take(math.max(1, merges.size / 4)))
      val encFull = encodeSec(merges)
      // One kernel expression in the executed plan, whatever the table
      // size (final plan section — AQE appends an Initial Plan dump).
      val plan = BpeTrainer.encodeVocab(corpusWords, merges)
        .queryExecution.executedPlan.toString()
      val folds = "graft_bpe_merge_fold".r
        .findAllIn(plan.split("== Initial Plan ==").head).length
      String.format(java.util.Locale.ROOT,
        """{"tier":"%s","vocab_size":%d,"merges_requested":%d,""" +
          """"merges_trained":%d,"exhausted":%s,"batch_size":%d,"rounds":%d,""" +
          """"rounds_floor":%d,"train_sec":%.2f,"encode_quarter_sec":%.2f,""" +
          """"encode_full_sec":%.2f,"encode_growth_x":%.2f,"fold_expressions":%d}""",
        tier, Long.box(vocabSize), Int.box(nMerges), Int.box(merges.size),
        Boolean.box(merges.size < nMerges), Int.box(batch), Int.box(rounds),
        Int.box((merges.size + batch - 1) / batch),
        Double.box(trainSec), Double.box(encQuarter), Double.box(encFull),
        Double.box(encFull / math.max(encQuarter, 1e-9)), Int.box(folds))
    }

    val words = run("words", BpeTrainer.wordVocab(docs, "text"))
    val bigrams = run("bigrams", bigramVocab)
    val json =
      s"""{"sf":"$sfDir","corpus_words":$nWords,"runs":[$words,$bigrams]}"""
    println(json)
    val out = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BPE_OUT", "bpe_scale.json"))
    try java.nio.file.Files.writeString(out, json + "\n")
    catch { case e: Throwable => System.err.println(s"[bpe-scale] write failed: $e") }
    spark.stop()
  }
}
