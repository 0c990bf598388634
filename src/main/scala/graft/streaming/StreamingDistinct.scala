package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{col, row_number}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Sketches

/** Streaming approximate distinct counting — the continuous twin of the
  * batch deterministic HLL (catalog q75, [[Sketches.hllDistinct]]): a live
  * per-key distinct-cardinality estimate maintained as CUSTOM state via
  * `mapGroupsWithState`.
  *
  * Why not `approx_count_distinct` in a windowed agg: streaming
  * aggregations keep opaque engine state and can't surface a running
  * estimate per update without a second aggregation (unsupported). Here the
  * state IS the HLL register array — 2^p bytes per group, bounded forever,
  * mergeable (same register-max law as the batch sketch) — and every
  * micro-batch emits the refreshed estimate for its groups.
  *
  * Determinism: identical SplitMix64 register math as the batch tier, so a
  * streaming estimate can be cross-checked by replaying the same events
  * through `Sketches.hllDistinct` — StreamingSpec does exactly that.
  *
  * Scale shape: state shuffles once on the group key; each state record is
  * `m` bytes (256 for p=8) however many distinct keys the group has seen —
  * the property that lets a 100 TB event feed keep per-entity cardinality
  * live without per-key state. Idle groups are evicted by processing-time
  * timeout after `idleEvict`.
  */
object StreamingDistinct {

  /** Input record: a group key and the value whose distincts are counted. */
  final case class KeyedValue(group: String, key: Long, ts: Timestamp)

  /** Running estimate emitted per group per micro-batch. */
  final case class DistinctEstimate(group: String, est_distinct: Double, n_events: Long)

  private[streaming] final case class HllState(regs: Array[Byte], n: Long)

  /** SplitMix64 finalizer — same constants as
    * [[graft.functions.HashFunctions.mix64]] (column form) and the q75
    * oracle replay; duplicated here only because state updates run on the
    * driver-side row values, not Columns. */
  private def mix64(z: Long): Long = {
    var x = z + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** Fold one key into the register array (p fixed at 8: m=256 registers,
    * one byte each — rho <= 57 fits comfortably). */
  private[streaming] def update(regs: Array[Byte], key: Long): Unit = {
    val h = mix64(key)
    val b = (h & 255L).toInt
    val w = h >>> 8
    val rho = if (w == 0L) 57 else 57 - (64 - java.lang.Long.numberOfLeadingZeros(w))
    if (rho > regs(b)) regs(b) = rho.toByte
  }

  /** The same raw estimator as [[Sketches.hllDistinct]] (p=8), evaluated
    * from a register array. */
  private[streaming] def estimate(regs: Array[Byte]): Double = {
    var s = BigInt(0)
    var i = 0
    while (i < 256) { s += BigInt(1) << (57 - regs(i)); i += 1 }
    Sketches.hllNumerator(8) / s.toDouble
  }

  /** Per-group running distinct estimate over a streaming feed.
    *
    * @param idleEvict optional processing-time timeout after which an idle
    *                  group's registers are dropped (its next event starts
    *                  fresh — the bounded-state trade for an indefinite
    *                  run). Default None: registers live forever, and —
    *                  important operationally — the engine does NOT have to
    *                  run continuous empty micro-batches just to poll
    *                  timeouts, which a registered processing-time timeout
    *                  forces on a default (as-fast-as-possible) trigger.
    */
  def runningDistinct(
      events: Dataset[KeyedValue],
      idleEvict: Option[String] = None): Dataset[DistinctEstimate] = {
    implicit val stateEnc = Encoders.product[HllState]
    implicit val outEnc = Encoders.product[DistinctEstimate]
    val timeoutConf = if (idleEvict.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.group)(Encoders.STRING)
      .mapGroupsWithState(timeoutConf)(
        (group: String, batch: Iterator[KeyedValue], state: GroupState[HllState]) => {
          if (batch.isEmpty && state.hasTimedOut) {
            val out = state.getOption
              .map(s => DistinctEstimate(group, estimate(s.regs), s.n))
              .getOrElse(DistinctEstimate(group, 0.0, 0L))
            state.remove()
            out
          } else {
            val s = state.getOption.getOrElse(HllState(new Array[Byte](256), 0L))
            var n = s.n
            batch.foreach { e => update(s.regs, e.key); n += 1 }
            val next = HllState(s.regs, n)
            state.update(next)
            idleEvict.foreach(state.setTimeoutDuration)
            DistinctEstimate(group, estimate(next.regs), n)
          }
        })
  }

  /** [[runningDistinct]] driven through the REAL Structured-Streaming
    * engine — the `mapGroupsWithState` sibling of
    * `StreamingSessionize.sessionsFileStream` (q174), closing the last
    * state-serialization path the gate otherwise never sees: REGISTER
    * state (a byte-array HLL) round-tripping through the engine's
    * checkpointed state store. `readStream` file source → the state-store
    * fold → update-mode memory sink, run to completion with
    * `Trigger.AvailableNow()`.
    *
    * Emission semantics under AvailableNow: each micro-batch emits every
    * updated group's refreshed estimate, so a group surfaces once per
    * batch it had data in. The TERMINAL estimate per group is selected
    * here by max `n_events` (registers only grow and `n` is strictly
    * increasing across a group's emissions) — deterministic whatever the
    * engine's file-batching, and equal by construction to the batch
    * replay over the same events, which is exactly what the q191 oracle
    * (q93's HLL replay) checks.
    *
    * EAGER like the q164/q174 twins: a terminal streaming result has no
    * lazy form. */
  def runningDistinctFileStream(spark: SparkSession, eventsPath: String): DataFrame = {
    import spark.implicits._
    val raw = StreamingHarness.fileSource(spark, eventsPath)
    val kv = raw
      .select(col("event_type").as("group"),
        col("user_id").cast("long").as("key"),
        graft.Tables.instantTs(raw.schema, "ts").as("ts"))
      .as[KeyedValue]
    val all = StreamingHarness.runToMemorySink(
      spark, runningDistinct(kv).toDF(), "update", Nil, Seq(eventsPath))
    val w = Window.partitionBy(col("group")).orderBy(col("n_events").desc)
    all
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
