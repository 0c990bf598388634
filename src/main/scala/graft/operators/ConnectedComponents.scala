package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over candidate-pair edges — the step
  * that turns near-dup PAIRS (MinHash-LSH, SimHash, embedding buckets)
  * into duplicate CLUSTERS, so survivor selection can keep exactly one
  * document per transitive group (a←→b, b←→c ⇒ {a,b,c} is ONE cluster
  * even though (a,c) never collided in any band).
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — converges in
  * O(log² n) rounds (O(log n) in practice), each round two key-partitioned
  * shuffles of the CURRENT edge set. Nothing is ever collected to the
  * driver and no step materializes a neighborhood list (per-key min +
  * join-back instead of collect_set), so one 10⁹-node component costs the
  * same per-round shuffle volume as a billion small ones — the skew
  * ceiling is the hottest single key's edge count, which AQE splits.
  *
  * Iteration hygiene for Spark: each round ends in `localCheckpoint`
  * (truncates the lineage — without it the plan doubles every round and
  * the driver dies of analysis time long before the executors break a
  * sweat) and convergence is decided by an order-independent fingerprint
  * (sum of per-edge hashes + count) so the check is one cheap action, not
  * a full `subtract`.
  */
object ConnectedComponents {

  /** Label every node of the pair graph with the smallest node id
    * reachable from it.
    *
    * @param pairs edges, two id columns (any orientation, dups fine)
    * @param aCol  left id column name
    * @param bCol  right id column name
    * @return (node, cluster) — one row per distinct node, cluster = min
    *         id of its component; roots label themselves.
    */
  def components(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      maxIter: Int = 32): DataFrame = {
    // Integral ids only — a silent cast("long") would turn string/UUID ids
    // into null, drop every edge at the u≠v filter, and report ZERO
    // duplicate clusters. Fail loudly instead; callers with string ids
    // should pre-hash them (xxhash64) to a stable long key.
    Guards.requireIntegralColumns(pairs, Seq(aCol, bCol), "components()")
    val a = col(aCol).cast("long")
    val b = col(bCol).cast("long")

    // Canonical undirected representation: every edge stored once as
    // hi → lo. Both star steps preserve this orientation (they only ever
    // point nodes at something ≤ a neighborhood minimum).
    // The checkpoint also pins the (possibly expensive) pair-generation
    // plan: EVERYTHING downstream — iterations, convergence probes, the
    // final node list — reads the materialized edges, so the upstream
    // pipeline (e.g. a full MinHash-LSH pass) executes exactly once.
    val ckInit = pairs
      .select(greatest(a, b).as("u"), least(a, b).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()
    // Right-size loop parallelism to the MEASURED edge count (the count
    // reads already-materialized blocks — cheap): every star round runs
    // 2 shuffles + 2 convergence probes, and on a small-to-medium pair
    // graph those are 32 near-empty tasks each. One partition per ~100k
    // edges, min 1 (the kCore rule). Applied to the INITIAL edge set
    // only, by measurement (the kCore finding): later rounds re-shuffle
    // to session width and AQE right-sizes their near-empty reads, while
    // both per-round re-apply variants bench worse — pre-checkpoint
    // serializes the round's own shuffle-read compute, post-checkpoint
    // imbalances consumers with fat merged blocks at no wall win. Round 1
    // is the only round whose input arrives un-shuffled, so it is where
    // explicit sizing pays.
    val nParts = math.max(1L, math.min(
      ckInit.rdd.getNumPartitions.toLong, ckInit.count() / 100000L + 1L)).toInt
    var edges =
      if (nParts < ckInit.rdd.getNumPartitions) ckInit.coalesce(nParts)
      else ckInit

    // large-star: per center u over the FULL neighborhood (symmetrize
    // first), m = min(N(u) ∪ {u}); re-point every larger neighbor at m.
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val m = sym.groupBy("u").agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("mv"), col("u")).as("m"))
      sym.join(m, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
    }

    // small-star on hi → lo edges: m = min smaller-neighbor; connect the
    // other smaller neighbors and the center itself to m.
    def smallStar(e: DataFrame): DataFrame = {
      val m = e.groupBy("u").agg(min(col("v")).as("m"))
      val relinked = e.join(m, "u")
        .select(col("v").as("u"), col("m").as("v"))
      val center = m.select(col("u"), col("m").as("v"))
      relinked.union(center)
        .filter(col("u") =!= col("v"))
        .distinct()
    }

    // Convergence = STAR FORM, checked directly: every u has exactly one
    // out-edge and no edge target is itself a source (roots emit nothing).
    // A star set is a fixed point of both steps, each star's root is its
    // component minimum (hi→lo orientation), and Kiveris et al. prove the
    // iteration's only fixed point is the star partition — so star form is
    // exactly convergence, detected ONE ROUND EARLIER than the previous
    // fingerprint-equality check (which needed an extra full
    // large+small-star round just to observe "nothing changed"). The two
    // probes are an aggregate and a semi-join on the current edge set —
    // cheaper than the round they replace at any scale.
    def isStarForm(e: DataFrame): Boolean = {
      // Two short-circuited actions, NOT a fused union-limit(1) probe:
      // in every non-converged round the degree probe finds a violation
      // almost immediately and && skips the semi-join entirely, so the
      // common case costs one cheap aggregate. A fused probe partially
      // executes BOTH branches every round and benched slower.
      val multiOut = e.groupBy("u").agg(count(lit(1)).as("d"))
        .filter(col("d") > 1).limit(1).isEmpty
      multiOut && e.select(col("v"))
        .join(e.select(col("u").as("v")), Seq("v"), "left_semi")
        .limit(1).isEmpty
    }

    // No pre-check on the initial edges: LSH/pair input is essentially
    // never star-form, so probing it costs two actions on the LARGEST
    // edge set for nothing — and if it is a star set, round 1 is a no-op
    // (stars are fixed points) and the post-round check still exits at
    // iter 1.
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      edges = smallStar(largeStar(edges)).localCheckpoint()
      converged = isStarForm(edges)
      iter += 1
    }
    // Non-converged labels are intermediate parents, not component minima —
    // survivor selection on them silently under-deduplicates. Fail loudly:
    // component diameter grows ~2^rounds, so a legitimate maxIter bump is
    // tiny, while hitting the default 32 means something is wrong.
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIter rounds; " +
          "raise maxIter (rounds needed ≈ log2 of the largest component's diameter)")

    // At convergence the edge set is a union of stars (child → root).
    // Roots have no outgoing edge — they label themselves. Nodes come from
    // the CHECKPOINTED initial edges, not the raw pairs plan (self-pairs
    // (x,x) carry no merge information, so dropping them with the u≠v
    // filter loses nothing).
    val nodes = ckInit.select(col("u").as("node"))
      .union(ckInit.select(col("v").as("node"))).distinct()
    nodes
      .join(edges.select(col("u").as("node"), col("v").as("root")), Seq("node"), "left")
      .select(col("node"), coalesce(col("root"), col("node")).as("cluster"))
  }

  /** Per-cluster summary: size and id span. The downstream keep-list is
    * `filter(node === cluster)` on [[components]]' output — no extra pass. */
  def clusterSizes(labels: DataFrame): DataFrame =
    labels
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_members"), max(col("node")).as("max_node"))
}
