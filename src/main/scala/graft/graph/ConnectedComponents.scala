package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components — the clustering step a dedup pipeline runs
  * between near-dup PAIRS and "keep one document per cluster": every
  * node ends up labeled with the smallest node id reachable from it,
  * so the label doubles as the deterministic keeper.
  *
  * Two algorithms behind one `run` entry point, selectable by flag:
  *
  *  - min-label propagation (default): labels live in a DataFrame
  *    partitioned by node id; each round is one join (edge × label) +
  *    one min-aggregation — two shuffles — and the driver only sees a
  *    change COUNT, never the labels. Rounds needed = component
  *    diameter; near-dup clusters are shallow (a dup cluster's LSH
  *    graph is dense), so convergence is a handful of rounds and every
  *    round is a plain equi-join.
  *  - alternating large-star/small-star (`useStar = true`): re-points
  *    edges at neighborhood minima each round, halving tree heights,
  *    so rounds grow logarithmically in the component size instead of
  *    linearly in its diameter — the robustness path for adversarial
  *    graphs (long chains) at billion-node scale.
  *
  * Edges are intersected with `nodes` up front (one semi-join per
  * endpoint): an id appearing only in `edges` would otherwise win the
  * min-label race and become a ghost keeper for its component.
  *
  * A third, bounded engine sits in front of both: when the (validated)
  * edge set is small enough to gather — `maxLocalEdges`, the same
  * bounded-driver-gather discipline as `Damds.maxGatherDoubles` — the
  * components are solved by driver union-find in one pass and shipped
  * back as a local relation. A near-dup graph is almost always in this
  * regime even when the corpus is not: edges exist only where documents
  * collide in a band, so a 100 TB corpus with a few million near-dup
  * pairs still fits the gather while the PAIR GENERATION stays fully
  * distributed. The distributed rounds only earn their ~0.3 s/round
  * shuffle overhead past that bound, where the dispatch sends them.
  */
object ConnectedComponents {

  /** `nodes`: one column `id`; `edges`: columns `id_a`, `id_b`
    * (undirected, any orientation; endpoints outside `nodes` are
    * dropped). Returns (id, label) with label = min id of the
    * component. Nodes absent from `edges` keep themselves. Fails if
    * `maxIter` rounds don't reach a fixpoint (raise maxIter consciously
    * rather than silently returning half-propagated labels).
    *
    * `strictGhosts = true` fails fast when any edge endpoint is outside
    * `nodes` instead of dropping the edge. The silent drop is right for
    * the dedup contract (a ghost id must never become a keeper), but it
    * also disconnects two valid nodes whose only path transits a ghost
    * — a caller merging externally-sourced edge sets should opt into
    * the loud mode to distinguish "ghost keeper prevented" from
    * "connectivity silently lost through a ghost node".
    *
    * `maxLocalEdges` bounds the driver union-find dispatch: a validated
    * edge set at or under it (counted with one aggregation — noise next
    * to even a single distributed round) is solved on the driver; above
    * it, or when set to 0 (how the algorithm specs pin the engine under
    * test), the star/propagation rounds run. The default gathers at
    * most 2²⁰ edges — two longs each, ~16 MB — the same order as the
    * other bounded gathers in this repo (centroids, PQ codebooks,
    * k-means‖ candidates).
    */
  def run(nodes: DataFrame, edges: DataFrame, maxIter: Int = 20,
      useStar: Boolean = false, strictGhosts: Boolean = false,
      maxLocalEdges: Long = 1L << 20): DataFrame = {
    val ids = nodes.select(col("id"))
    // pinned across the dispatch: the upstream edge computation (e.g.
    // v10's LSH band join + cosine verify, the expensive stage) must
    // run ONCE, not once for the dispatch count and again for the
    // engine. Every engine cuts its own lineage from this immediately
    // (collect / localCheckpoint), so unpersisting on exit is safe.
    val valid = edges
      .join(ids.select(col("id").as("id_a")), Seq("id_a"), "left_semi")
      .join(ids.select(col("id").as("id_b")), Seq("id_b"), "left_semi")
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      if (strictGhosts) {
        val ghost = edges.count() - valid.count()
        require(ghost == 0L,
          s"$ghost edge(s) have an endpoint outside `nodes` " +
            "(strictGhosts): clean the edge set or drop strict mode")
      }
      // the driver union-find walks ids as longs; a non-integral id
      // type (string ids, say) would NPE on null casts or silently
      // merge colliding ids ("7" vs "07"), so only integral-id graphs
      // dispatch locally — everything else falls through to the
      // distributed engines, which compare ids natively (ADVICE r10)
      val integralId = nodes.schema("id").dataType match {
        case org.apache.spark.sql.types.ByteType |
            org.apache.spark.sql.types.ShortType |
            org.apache.spark.sql.types.IntegerType |
            org.apache.spark.sql.types.LongType => true
        case _ => false
      }
      if (integralId && maxLocalEdges > 0L && valid.count() <= maxLocalEdges)
        runLocal(nodes, valid)
      else if (useStar) runStar(nodes, valid, maxIter)
      else runPropagate(nodes, valid, maxIter)
    } finally valid.unpersist()
  }

  /** Driver union-find over a gathered edge set (dispatch target below
    * `maxLocalEdges`). Union always attaches the larger root under the
    * smaller, so every set's root IS its minimum id and `find` yields
    * the label directly; path compression keeps the walk amortized
    * near-constant. The result is a pure function of the edge SET
    * (order-independent), so labels are identical to the distributed
    * engines' — v10's cross-engine oracle gates this path end-to-end,
    * d14/d21 gate the two distributed ones.
    */
  private def runLocal(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val idType = nodes.schema("id").dataType
    val gathered = edges
      .select(col("id_a").cast("long"), col("id_b").cast("long"))
      .collect()
    if (gathered.isEmpty)
      return nodes.select(col("id"), col("id").as("label"))
    val parent = new java.util.HashMap[Long, Long](gathered.length * 2)
    def find(x0: Long): Long = {
      var x = x0
      var p = parent.getOrDefault(x, x)
      while (p != x) {
        val gp = parent.getOrDefault(p, p)
        parent.put(x, gp)
        x = p
        p = gp
      }
      x
    }
    gathered.foreach { r =>
      val ra = find(r.getLong(0))
      val rb = find(r.getLong(1))
      if (ra < rb) parent.put(rb, ra)
      else if (rb < ra) parent.put(ra, rb)
    }
    val endpoints = new java.util.TreeSet[java.lang.Long]()
    gathered.foreach { r =>
      endpoints.add(r.getLong(0)); endpoints.add(r.getLong(1))
    }
    val spark = nodes.sparkSession
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val labels = endpoints.iterator().asScala
      .map(id => (id.longValue(), find(id.longValue()))).toSeq
      .toDF("id", "label")
      .select(col("id").cast(idType), col("label").cast(idType))
    nodes.join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("label"), col("id")).as("label"))
  }

  private def runPropagate(nodes: DataFrame, edges: DataFrame,
      maxIter: Int): DataFrame = {
    val sym = edges.select(col("id_a").as("dst"), col("id_b").as("src"))
      .union(edges.select(col("id_b").as("dst"), col("id_a").as("src")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // iterate ONLY over edge endpoints: in a dedup graph almost every
    // node is isolated (no near-dup pair), and an isolated node's label
    // is trivially itself — carrying them through every round's join
    // would multiply the iterated state by |V|/|V_endpoints| (easily
    // 100× at corpus scale) for no information
    val endpoints = sym.select(col("src").as("id")).distinct()
    // localCheckpoint per round, NOT persist: an iterative DataFrame's
    // logical plan otherwise embeds every previous round, and planning
    // alone goes superlinear by round ~15 (observed: a 40-round chain
    // never finished). Checkpointing pins the round's rows and resets
    // the plan to a leaf — the same reason the reference's bulk
    // iteration materializes its superstep barrier.
    var labels = endpoints.select(col("id"), col("id").as("label"))
      .localCheckpoint(true)
    var it = 0
    var converged = false
    while (!converged && it < maxIter) {
      // smallest label among each node's neighbors this round
      val nbr = sym
        .join(labels.select(col("id").as("dst"), col("label").as("nl")), "dst")
        .groupBy(col("src").as("id")).agg(min(col("nl")).as("nl"))
      // carry the previous label through the checkpoint so the change
      // count is a scan of the pinned rows, not a third join+shuffle
      val next = labels.join(nbr, Seq("id"), "left")
        .select(col("id"), col("label").as("old"),
          least(col("label"), coalesce(col("nl"), col("label"))).as("label"))
        .localCheckpoint(true)
      val changed = next.filter(col("label") < col("old")).count()
      labels = next.select(col("id"), col("label"))
      converged = changed == 0
      it += 1
    }
    sym.unpersist()
    require(converged,
      s"connected components did not converge in $maxIter rounds; " +
        "component diameter exceeds the bound — raise maxIter")
    // isolated nodes label themselves; one left join re-attaches them
    nodes.join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("label"), col("id")).as("label"))
  }

  /** Alternating algorithm (Kiveris et al., "Connected Components in
    * MapReduce and Beyond", SoCC'14): each round applies
    *
    *  - large-star: every node re-points its LARGER neighbors at the
    *    minimum of its neighborhood (including itself);
    *  - small-star: every node re-points its smaller neighbors (and
    *    itself) at the minimum of its smaller neighborhood.
    *
    * Both steps keep edges canonical (child > parent) and monotonically
    * shrink tree heights, so the edge set converges to per-component
    * stars rooted at the minima in logarithmically many rounds — a path
    * graph that costs min-propagation `diameter` rounds converges here
    * in ~log₂(diameter). Each round is two groupBy-min shuffles + two
    * joins over the EDGE set only (nodes never iterate), with the same
    * localCheckpoint-per-round plan-reset discipline as the
    * propagation path.
    */
  private def runStar(nodes: DataFrame, edges: DataFrame,
      maxIter: Int): DataFrame = {
    var e = edges
      .filter(col("id_a") =!= col("id_b"))
      .select(greatest(col("id_a"), col("id_b")).as("u"),
        least(col("id_a"), col("id_b")).as("v"))
      .distinct()
      .localCheckpoint(true)
    // Fixpoint detection: every round's edge set is DISTINCT and
    // canonical, so set equality reduces to cardinality + an
    // order-independent digest — ONE aggregation job per round, with
    // the previous round's stats carried on the driver, instead of two
    // shuffle-heavy exceptAll anti-joins over the full edge set (which
    // roughly doubled round cost at billion-edge scale). Two
    // independently-seeded 64-bit xor digests make a silent collision
    // (different sets, equal count and both digests) a ~2⁻¹²⁸ event.
    def edgeStats(df: DataFrame): (Long, Long, Long) = {
      val r = df.agg(
        count(lit(1)),
        coalesce(bit_xor(xxhash64(col("u"), col("v"))), lit(0L)),
        coalesce(bit_xor(xxhash64(lit(17L), col("u"), col("v"))), lit(0L)))
        .head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    var eStats = edgeStats(e)
    var it = 0
    var converged = eStats._1 == 0L
    while (!converged && it < maxIter) {
      // large-star over the symmetrized adjacency: m = min(Γ(u) ∪ {u});
      // every neighbor v > u re-points to m. `sym` and `ls` are each
      // consumed twice (self-join with their own groupBy-min), so both
      // are pinned for the round instead of being recomputed through
      // the shuffle on each side of the join.
      val sym = e.select(col("u"), col("v"))
        .union(e.select(col("v").as("u"), col("u").as("v")))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val ls = sym
        .join(sym.groupBy("u").agg(min(col("v")).as("mn")), "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), least(col("mn"), col("u")).as("v"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      // small-star over the (already canonical u > v) edges: m =
      // min(Γ⁻(u)); smaller neighbors and u itself re-point to m
      val ss = ls
        .join(ls.groupBy("u").agg(min(col("v")).as("m")), "u")
        .select(when(col("v") === col("m"), col("u")).otherwise(col("v")).as("u"),
          col("m").as("v"))
        .distinct()
      val next = ss.localCheckpoint(true)
      sym.unpersist()
      ls.unpersist()
      val nStats = edgeStats(next)
      converged = nStats == eStats
      e = next
      eStats = nStats
      it += 1
    }
    require(converged,
      s"star connected components did not converge in $maxIter rounds " +
        "— raise maxIter")
    // fixpoint is a star forest: every edge is (child, component-min)
    val labels = e.select(col("u").as("id"), col("v").as("label"))
    nodes.join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("label"), col("id")).as("label"))
  }
}
