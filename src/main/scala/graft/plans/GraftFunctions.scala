package graft.plans

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Registration surface for the engine's native Catalyst expressions —
  * usable three ways:
  *
  *   - Column API: `GraftFunctions.cosineFast(a, b)`
  *   - existing session: `GraftFunctions.register(spark)` then
  *     `spark.sql("SELECT graft_cosine(a, b) ...")`
  *   - cluster-wide: `--conf spark.sql.extensions=graft.plans.GraftExtensions`
  */
object GraftFunctions {

  /** Fused codegen cosine (fast ranking tier — see [[CosineSimilarity]]). */
  def cosineFast(a: Column, b: Column): Column =
    ColumnBridge.column(
      CosineSimilarity(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** MinHash signature kernel over an `array<bigint>` of shingle hashes
    * (see [[MinHashSig]]). */
  def minHashSig(hashes: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(hashes), numHashes))

  private[plans] val cosineBuilder: Seq[Expression] => Expression = { children =>
    require(children.length == 2, "graft_cosine expects exactly 2 arguments")
    CosineSimilarity(children(0), children(1))
  }

  private[plans] val cosineInfo =
    new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine")

  private[plans] val minhashBuilder: Seq[Expression] => Expression = { children =>
    require(children.length == 2, "graft_minhash expects (hashes, numHashes)")
    val n = children(1) match {
      case e if e.foldable => e.eval(null).asInstanceOf[Number].intValue()
      case _ => throw new IllegalArgumentException(
        "graft_minhash numHashes must be a literal")
    }
    MinHashSig(children(0), n)
  }

  private[plans] val minhashInfo =
    new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash")

  /** Fused importance-scoring kernel (see [[EnrichedTokenCount]]): packed
    * `(n_tokens << 32) | n_enriched` of `tokens` against the verdict
    * bitmap. Column-API only — the bitmap is a driver-side array, not a
    * SQL literal. */
  def enrichedCount(tokens: Column, bits: Array[Long]): Column =
    ColumnBridge.column(
      EnrichedTokenCount(ColumnBridge.expression(tokens), bits.toIndexedSeq))

  /** Unicode NFC normalization (see [[NfcNormalize]]). */
  def nfcNormalize(s: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(s)))

  /** Merge-walk intersection cardinality of two sorted string-array sets
    * (see [[SortedIntersectCount]]) — the PPJoin verify kernel. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(
      SortedIntersectCount(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Apply a BPE merge table, in rank order, each merge a greedy
    * non-overlapping left-to-right pass (see [[BpeMergeFold]]) — the BPE
    * train/encode kernel. */
  def bpeMergeFold(syms: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeMergeFold(ColumnBridge.expression(syms), merges))

  /** Nearest-centroid label by exact-decimal squared L2, ties to the
    * smaller label (see [[IvfArgminL2]]) — the IVF coarse-assign kernel;
    * the centroid matrix ships once per task as a reference object, so
    * cluster counts scale with the corpus (k ∝ N) instead of with plan
    * size. Column-API only (a matrix parameter is not SQL-expressible,
    * the [[BpeMergeFold]] convention). */
  def ivfArgmin(vec: Column, labels: Array[Long], cents: Array[Array[Long]]): Column =
    ColumnBridge.column(IvfArgminL2(ColumnBridge.expression(vec), labels, cents))

  /** Exact-decimal dot product as DECIMAL(30,12) (see [[ExactVecScaled]])
    * — the oracle-tier pair-scoring kernel behind
    * [[graft.functions.VectorFunctions.dotExact]]. */
  def dotExactDec(a: Column, b: Column): Column =
    ColumnBridge.column(
      ExactVecScaled(ColumnBridge.expression(a), ColumnBridge.expression(b), dot = true))

  /** Exact-decimal squared L2 as DECIMAL(30,12) (see [[ExactVecScaled]]). */
  def l2SqExactDec(a: Column, b: Column): Column =
    ColumnBridge.column(
      ExactVecScaled(ColumnBridge.expression(a), ColumnBridge.expression(b), dot = false))

  private[plans] val nfcBuilder: Seq[Expression] => Expression = { children =>
    require(children.length == 1, "graft_nfc expects exactly 1 argument")
    NfcNormalize(children.head)
  }

  private[plans] val nfcInfo =
    new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc")

  /** HTML character-reference decode (see [[HtmlEntityDecode]]) — named
    * entities + decimal/hex numeric refs, single-pass single-decode. */
  def htmlUnescape(s: Column): Column =
    ColumnBridge.column(HtmlEntityDecode(ColumnBridge.expression(s)))

  private[plans] val htmlUnescapeBuilder: Seq[Expression] => Expression = { children =>
    require(children.length == 1, "graft_html_unescape expects exactly 1 argument")
    HtmlEntityDecode(children.head)
  }

  private[plans] val htmlUnescapeInfo =
    new ExpressionInfo(classOf[HtmlEntityDecode].getName, "graft_html_unescape")

  /** `<pre>` whitespace → C0 sentinels (see [[PreWhitespaceSentinels]]) —
    * the protect half of htmlToText's preformatted-block rule; the
    * extractor translates the sentinels back after its global collapse. */
  def preSentinels(s: Column): Column =
    ColumnBridge.column(PreWhitespaceSentinels(ColumnBridge.expression(s)))

  private[plans] val preSentinelsBuilder: Seq[Expression] => Expression = { children =>
    require(children.length == 1, "graft_pre_sentinels expects exactly 1 argument")
    PreWhitespaceSentinels(children.head)
  }

  private[plans] val preSentinelsInfo =
    new ExpressionInfo(classOf[PreWhitespaceSentinels].getName, "graft_pre_sentinels")

  /** Grouped top-k aggregate (see [[TopKAgg]]): the k largest `(ord, id)`
    * pairs by (ord DESC, id ASC), in rank order. Use instead of a
    * `row_number` window when only the top k rows per group are needed —
    * partial aggregation keeps the shuffle at groups × k. */
  def topK(ord: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopKAgg(ColumnBridge.expression(ord), ColumnBridge.expression(id), k)
        .toAggregateExpression())

  private[plans] val topkBuilder: Seq[Expression] => Expression = { children =>
    require(children.length == 3, "graft_topk expects (ord, id, k)")
    val k = children(2) match {
      case e if e.foldable => e.eval(null).asInstanceOf[Number].intValue()
      case _ => throw new IllegalArgumentException(
        "graft_topk k must be a literal")
    }
    TopKAgg(children(0), children(1), k)
  }

  private[plans] val topkInfo =
    new ExpressionInfo(classOf[TopKAgg].getName, "graft_topk")

  /** Bottom-k-by-hash aggregate (see [[KmvAgg]]): the k pairs with the
    * smallest signed-long hash `h`, payload `v` carried through, sorted by
    * `h` ascending — the register buffer of
    * [[graft.operators.Sketches.kmvRegisters]]. */
  def kmvBottomK(h: Column, v: Column, k: Int): Column =
    ColumnBridge.column(
      KmvAgg(ColumnBridge.expression(h), ColumnBridge.expression(v), k)
        .toAggregateExpression())

  private[plans] val kmvBuilder: Seq[Expression] => Expression = { children =>
    require(children.length == 3, "graft_kmv expects (h, v, k)")
    val k = children(2) match {
      case e if e.foldable => e.eval(null).asInstanceOf[Number].intValue()
      case _ => throw new IllegalArgumentException(
        "graft_kmv k must be a literal")
    }
    KmvAgg(children(0), children(1), k)
  }

  private[plans] val kmvInfo =
    new ExpressionInfo(classOf[KmvAgg].getName, "graft_kmv")

  /** Register the engine's functions into an already-running session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier("graft_cosine"), cosineInfo, cosineBuilder)
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier("graft_minhash"), minhashInfo, minhashBuilder)
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier("graft_nfc"), nfcInfo, nfcBuilder)
    spark.sessionState.functionRegistry
      .registerFunction(
        FunctionIdentifier("graft_html_unescape"), htmlUnescapeInfo, htmlUnescapeBuilder)
    spark.sessionState.functionRegistry
      .registerFunction(
        FunctionIdentifier("graft_pre_sentinels"), preSentinelsInfo, preSentinelsBuilder)
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier("graft_topk"), topkInfo, topkBuilder)
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier("graft_kmv"), kmvInfo, kmvBuilder)
  }
}

/** `spark.sql.extensions` entry point injecting the engine's functions at
  * session build time (the deployment path for a real cluster). Reuses the
  * registry-path builders so BOTH paths validate arity and the
  * numHashes-must-be-a-literal contract identically. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => FusePercentiles)
    ext.injectFunction(
      (FunctionIdentifier("graft_cosine"), GraftFunctions.cosineInfo,
        GraftFunctions.cosineBuilder))
    ext.injectFunction(
      (FunctionIdentifier("graft_minhash"), GraftFunctions.minhashInfo,
        GraftFunctions.minhashBuilder))
    ext.injectFunction(
      (FunctionIdentifier("graft_nfc"), GraftFunctions.nfcInfo,
        GraftFunctions.nfcBuilder))
    ext.injectFunction(
      (FunctionIdentifier("graft_html_unescape"), GraftFunctions.htmlUnescapeInfo,
        GraftFunctions.htmlUnescapeBuilder))
    ext.injectFunction(
      (FunctionIdentifier("graft_pre_sentinels"), GraftFunctions.preSentinelsInfo,
        GraftFunctions.preSentinelsBuilder))
    ext.injectFunction(
      (FunctionIdentifier("graft_topk"), GraftFunctions.topkInfo,
        GraftFunctions.topkBuilder))
    ext.injectFunction(
      (FunctionIdentifier("graft_kmv"), GraftFunctions.kmvInfo,
        GraftFunctions.kmvBuilder))
  }
}
