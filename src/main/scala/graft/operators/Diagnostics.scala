package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Pre-flight diagnostics for 100 TB jobs — operators that answer "is this
  * join/aggregation about to blow up?" from the key distributions alone,
  * BEFORE running the expensive job. The reference's analogue is its
  * monitoring surface (reference `docs/MONITORING.md:93-96` connection/cache
  * SLOs); at Spark scale the thing worth watching is shuffle-key skew.
  */
object Diagnostics {

  /** Join-skew probe: per-key row counts on both sides of a prospective
    * equi-join and the key's output contribution `n_left * n_right`,
    * top-`topN` keys by contribution.
    *
    * The contribution sum IS the exact inner-join output size, computed
    * without running the join: two map-side-combined aggregations (shuffle =
    * distinct keys, not rows) and a join of the two count tables. A key
    * whose product dwarfs the rest is the one that strands a 1000-executor
    * stage on one straggler task — the decision input for salting
    * ([[Rollup.saltedSumCount]]'s trick) or AQE skew-join thresholds.
    */
  def joinSkewProbe(
      left: DataFrame,
      right: DataFrame,
      key: String,
      topN: Int = 20): DataFrame = {
    val l = left.groupBy(col(key)).agg(count(lit(1)).as("n_left"))
    val r = right.groupBy(col(key)).agg(count(lit(1)).as("n_right"))
    l.join(r, Seq(key))
      .withColumn("est_pairs", col("n_left") * col("n_right"))
      .orderBy(col("est_pairs").desc, col(key))
      .limit(topN)
  }

  /** Distribution drift between two snapshots — the "did this month's crawl
    * shift under me" audit a training-data pipeline runs before mixing a
    * new snapshot in. Per group, a binned two-sample Kolmogorov-Smirnov
    * distance: `max_bin |cdfA - cdfB|`, kept EXACT by cross-multiplying —
    * the numerator `max |cumA·nB - cumB·nA|` is pure integer arithmetic
    * (decimal(38,0): billion-row sides overflow BIGINT products), so two
    * engines and any partitioning agree bit-for-bit; the final
    * `ks_stat = num / (nA·nB)` is one correctly-rounded double division of
    * values exact below 2^53.
    *
    * Values bin by `least(bins-1, greatest(0, floor(((v - lo) / (hi - lo))
    * · bins)))` — fixed literal edges, so binning is reproducible and the
    * operation order is replayable in SQL verbatim.
    *
    * Scale shape: ONE map-side-combined aggregation over the tagged union
    * (shuffle keyed (group, bin), carrying ≤ groups × bins rows regardless
    * of input size), then windows + the final max over that bounded table.
    * No join of the two sides; the corpus rows are read once each.
    * Groups present on only one side are dropped (KS against an empty
    * sample is undefined); emits `(groupCols*, n_a, n_b, ks_num, ks_stat)`.
    */
  /** Per-bucket volume anomalies within each group — the "did traffic in
    * some hour spike" audit (the reference's monitoring surface tracks
    * exactly this class of signal on its dashboards; here it is a query
    * over the event stream instead of a sidecar system). For every
    * `(group, bucket)` count `c`, flags the bucket when `|c − μ_g| > z·σ_g`
    * with μ/σ the group's own bucket-count mean and population stddev.
    *
    * The test is kept EXACT by cross-multiplying out both divisions:
    * with `n` buckets, `s = Σc`, `ss = Σc²`, the flag is
    * `(n·c − s)² > z²·(n·ss − s²)` — pure integer arithmetic
    * (decimal(38,0): at 100 TB the products pass 2^63), so two engines and
    * any partitioning agree bit-for-bit; no double ever enters the verdict.
    *
    * Scale shape: one map-side-combined aggregation to `(group, bucket)`
    * counts (shuffle carries ≤ groups × buckets rows regardless of input),
    * one group-sized stats aggregation broadcast back onto the bucket
    * table. Emits `(groupCols*, bucket, n_rows, is_anomalous)`.
    */
  def countAnomalies(
      df: DataFrame,
      groupCols: Seq[String],
      bucket: Column,
      z: Int): DataFrame = {
    require(z > 0, s"z threshold must be positive, got $z")
    val g = groupCols.map(col)
    val counts = df
      .groupBy(g :+ bucket.as("bucket"): _*)
      .agg(count(lit(1)).as("n_rows"))
    val dec = col("n_rows").cast("decimal(38,0)")
    val stats = counts
      .groupBy(g: _*)
      .agg(
        count(lit(1)).cast("decimal(38,0)").as("__n"),
        sum(dec).as("__s"),
        sum(dec * dec).as("__ss"))
    val dev = col("__n") * dec - col("__s")
    counts
      .join(broadcast(stats), groupCols)
      .withColumn("is_anomalous",
        dev * dev > lit(z.toLong * z).cast("decimal(38,0)") *
          (col("__n") * col("__ss") - col("__s") * col("__s")))
      .drop("__n", "__s", "__ss")
  }

  /** Per-dimension embedding health audit: for every vector dimension, the
    * count, zero-count, exact sum and exact variance numerator of the
    * quantized coordinate — the "dead / collapsed dimension" check a
    * pipeline runs before trusting an embedding column for similarity
    * work (a dimension with `var_num = 0` carries no information; a large
    * `n_zero` fraction marks sparse or truncated encoders).
    *
    * Coordinates quantize to integer units of 1e-6
    * (`CAST(v AS DECIMAL(18,6)) · 10⁶` — the same element quantization as
    * [[graft.functions.VectorFunctions.dotExact]]), so `sum_u`, `ss` and
    * the variance numerator `var_num = n·ss − s²` are EXACT integer
    * arithmetic — order-independent, partitioning-independent, and
    * bit-identical in an independent SQL engine. No double appears in the
    * output; callers derive `var = var_num / (n²·10¹²)` when they want the
    * float.
    *
    * Scale shape: posexplode is a plain generate over the stored array
    * (stays in whole-stage codegen — no higher-order function feeds the
    * explode), and the single aggregation shuffles ≤ `dim` rows per map
    * partition after partial aggregation. Output is dim-sized.
    */
  def embeddingDimStats(emb: DataFrame, vecCol: String): DataFrame = {
    val u = (col("__v").cast("double").cast("decimal(18,6)") * lit(1000000))
      .cast("decimal(38,0)")
    emb
      .select(posexplode(col(vecCol)).as(Seq("dim", "__v")))
      .select(col("dim").cast("long").as("dim"), u.as("__u"))
      .groupBy(col("dim"))
      .agg(
        count(lit(1)).as("n_vecs"),
        sum(when(col("__u") === 0, 1L).otherwise(0L)).as("n_zero"),
        sum(col("__u")).cast("decimal(38,0)").as("sum_u"),
        sum(col("__u") * col("__u")).cast("decimal(38,0)").as("__ss"))
      .select(
        col("dim"), col("n_vecs"), col("n_zero"), col("sum_u"),
        (col("n_vecs").cast("decimal(38,0)") * col("__ss") -
          col("sum_u") * col("sum_u")).cast("decimal(38,0)").as("var_num"))
  }

  def ksDrift(
      dfA: DataFrame,
      dfB: DataFrame,
      groupCols: Seq[String],
      valueCol: Column,
      bins: Int,
      lo: Double,
      hi: Double): DataFrame = {
    require(bins >= 2, s"need at least 2 bins, got $bins")
    require(hi > lo, s"empty value range [$lo, $hi]")
    val g = groupCols.map(col)
    def side(df: DataFrame, tag: Int): DataFrame =
      df.select(g :+ valueCol.cast("double").as("__v"): _*).withColumn("__side", lit(tag))
    val binExpr = least(lit(bins - 1), greatest(lit(0),
      floor((col("__v") - lit(lo)) / lit(hi - lo) * lit(bins)).cast("int")))
    val counts = side(dfA, 0).unionByName(side(dfB, 1))
      .withColumn("__bin", binExpr)
      .groupBy(g :+ col("__bin"): _*)
      .agg(
        sum(when(col("__side") === 0, 1L).otherwise(0L)).as("__ca"),
        sum(when(col("__side") === 1, 1L).otherwise(0L)).as("__cb"))
    val wCum = Window.partitionBy(g: _*).orderBy(col("__bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(g: _*)
    counts
      .withColumn("__cuma", sum(col("__ca")).over(wCum))
      .withColumn("__cumb", sum(col("__cb")).over(wCum))
      .withColumn("__na", sum(col("__ca")).over(wAll))
      .withColumn("__nb", sum(col("__cb")).over(wAll))
      .groupBy(g: _*)
      .agg(
        max(col("__na")).as("n_a"),
        max(col("__nb")).as("n_b"),
        max(abs(col("__cuma").cast("decimal(19,0)") * col("__nb") -
          col("__cumb").cast("decimal(19,0)") * col("__na")))
          .cast("decimal(38,0)").as("ks_num"))
      .filter(col("n_a") > 0 && col("n_b") > 0)
      .withColumn("ks_stat",
        col("ks_num").cast("double") / (col("n_a").cast("double") * col("n_b").cast("double")))
  }

  /** Pairwise Pearson correlation of numeric columns in EXACT arithmetic —
    * the feature-redundancy audit run before trusting columns into a
    * model. Values quantize losslessly to integer units of `1/scale`
    * (pick `scale` to cover the columns' literal decimal precision); the
    * moment sums accumulate in exact decimals (Σx as decimal(29,0),
    * Σx²/Σxy as decimal(38,0)) — associative, order-independent,
    * engine-portable — and only the final correlation divides through
    * IEEE doubles (correctly-rounded sqrt/÷ of exactly-agreed integers,
    * so even the doubles are bit-stable cross-engine).
    *
    * Precision budget: the n·Σxy − Σx·Σy cross-products must fit 38
    * digits — |x·scale|² · rows ≲ 1e38, e.g. 1e12 rows of 1e7-unit
    * values at the cap. Past it Spark's decimal arithmetic yields null
    * (ANSI off), so every derived term is overflow-GUARDED: the query
    * fails loudly telling you to reduce `scale`, never returns a silent
    * null/NaN correlation.
    *
    * Scale shape: ONE map-side-combined global aggregation over the scan
    * — k² agg buffers in a single row, zero shuffle beyond the 1-row
    * final merge — then the pair table expands row-locally from that one
    * row. The single-pass textbook formula n·Σxy − Σx·Σy is SAFE here
    * because the sums are exact integers: catastrophic cancellation is a
    * floating-point disease. */
  def correlationMatrix(
      df: DataFrame,
      cols: Seq[String],
      scale: Long = 100L): DataFrame = {
    require(cols.size >= 2, "correlationMatrix needs at least two columns")
    val dec = DecimalType(19, 0)
    // listwise-complete: a row with ANY null column leaves every moment,
    // so n and the sums stay mutually consistent (sum() would silently
    // skip nulls while count() kept the row)
    val q = df.select(cols.map(c =>
      expr(s"CAST(round($c * $scale) AS BIGINT)").cast(dec).as(s"__$c")): _*)
      .na.drop()
    val pairs = for { i <- cols.indices; j <- cols.indices if i < j } yield (cols(i), cols(j))
    val aggExprs =
      (count(lit(1)).cast(dec).as("__n") +:
        cols.flatMap(c => Seq(
          sum(col(s"__$c")).as(s"__s_$c"),
          sum(col(s"__$c") * col(s"__$c")).as(s"__ss_$c")))) ++
        pairs.map { case (a, b) => sum(col(s"__$a") * col(s"__$b")).as(s"__p_${a}_$b") }
    val one = q.agg(aggExprs.head, aggExprs.tail: _*)
    // decimal overflow (past precision 38) nulls silently with ANSI off —
    // surface it as a job failure instead of a null correlation
    def guarded(c: Column): Column =
      when(col("__n") === 0, lit(null).cast(DecimalType(38, 0)))
        .otherwise(coalesce(c,
          expr("CAST(raise_error('correlationMatrix: decimal overflow — reduce scale') AS DECIMAL(38,0))")))
    val rows = pairs.map { case (a, b) =>
      struct(
        lit(a).as("col_a"), lit(b).as("col_b"),
        col("__n").cast("long").as("n"),
        guarded(col("__n") * col(s"__p_${a}_$b") - col(s"__s_$a") * col(s"__s_$b"))
          .cast("double").as("num"),
        guarded(col("__n") * col(s"__ss_$a") - col(s"__s_$a") * col(s"__s_$a"))
          .cast("double").as("den_a"),
        guarded(col("__n") * col(s"__ss_$b") - col(s"__s_$b") * col(s"__s_$b"))
          .cast("double").as("den_b"))
    }
    one.select(explode(array(rows: _*)).as("__r"))
      .select(col("__r.*"))
      .withColumn("corr", col("num") / (sqrt(col("den_a")) * sqrt(col("den_b"))))
  }

  /** Inter-arrival spectrum: the distribution of time gaps between a
    * unit's consecutive events, bucketed into power-of-2 second bands —
    * the cadence fingerprint behind rate-limit tuning, bot detection
    * ("sub-second metronome traffic"), and sessionization-gap choice
    * (q33's 30 minutes should sit in a valley of this histogram).
    *
    * The bucket is the BIT LENGTH of the gap in seconds (`length(bin(g))`
    * — exact integer both engines, no libm log2): bucket b covers
    * [2^(b-1), 2^b), bucket 0 is the sub-second band. Determinism: gaps
    * order by (tsCol, tieCol) — a total order.
    *
    * Scale shape: ONE partition-keyed shuffle+sort for the lag window
    * (the unavoidable sequence pass, shared shape with q112's
    * transitions), then everything is reportCols × ~40 buckets. */
  def interArrivalSpectrum(
      df: DataFrame,
      partitionCols: Seq[String],
      reportCols: Seq[String],
      tsCol: String,
      tieCol: String): DataFrame = {
    require(partitionCols.nonEmpty, "need at least one partition column")
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(col(tsCol), col(tieCol))
    df.select((partitionCols ++ reportCols).distinct.map(col) :+
        col(tsCol) :+ col(tieCol): _*)
      .withColumn("__prev", lag(col(tsCol), 1).over(w))
      .filter(col("__prev").isNotNull)
      .withColumn("__gap",
        expr(s"(unix_micros($tsCol) - unix_micros(__prev)) div 1000000"))
      .withColumn("bucket",
        when(col("__gap") <= 0, lit(0))
          .otherwise(length(bin(col("__gap")))).cast("int"))
      .groupBy(reportCols.map(col) :+ col("bucket"): _*)
      .agg(count(lit(1)).as("n_gaps"))
      .withColumn("gap_lo_s",
        when(col("bucket") === 0, lit(0L))
          .otherwise(expr("shiftleft(CAST(1 AS BIGINT), bucket - 1)")))
      .withColumn("gap_hi_s", expr("shiftleft(CAST(1 AS BIGINT), bucket) - 1"))
  }

  /** Item-affinity matrix: for every pair of items, how many UNITS (users,
    * documents, sessions) carry both, with the exact Jaccard overlap in
    * integer ppm — the "users who do X also do Y" / label-co-occurrence
    * audit. Output is |items|²-bounded, tiny for categorical item domains.
    *
    * Scale shape: (unit, item) pairs collapse to distinct per-unit item
    * SETS in one unit-keyed aggregation (`collect_set` is safe here
    * because the item domain — not the unit count — bounds the set);
    * ordered pairs expand ROW-LOCALLY from each sorted set (never a
    * corpus self-join on unit), and the per-item totals join back
    * broadcast. A high-cardinality item domain needs the self-join form
    * instead — this operator is for categorical domains and says so. */
  def cooccurrenceAffinity(
      df: DataFrame,
      unitCol: String,
      itemCol: String): DataFrame = {
    val sets = df.groupBy(col(unitCol))
      .agg(sort_array(collect_set(col(itemCol))).as("__items"))
    val pairs = sets
      .select(explode(flatten(transform(col("__items"), x =>
        transform(filter(col("__items"), y => y > x), y =>
          struct(x.as("item_a"), y.as("item_b")))))).as("__p"))
      .select(col("__p.item_a"), col("__p.item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_both"))
    val totals = df.select(col(unitCol), col(itemCol)).distinct()
      .groupBy(col(itemCol)).agg(count(lit(1)).as("__n"))
    pairs
      .join(broadcast(totals.select(col(itemCol).as("item_a"), col("__n").as("n_a"))),
        Seq("item_a"))
      .join(broadcast(totals.select(col(itemCol).as("item_b"), col("__n").as("n_b"))),
        Seq("item_b"))
      .select(col("item_a"), col("item_b"), col("n_a"), col("n_b"), col("n_both"),
        expr("(n_both * 1000000) div (n_a + n_b - n_both)").as("jaccard_ppm"))
  }
}
