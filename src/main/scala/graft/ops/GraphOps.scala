package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Graph analytics over relational edge frames. The engine already
  * does connected components (the dedup-cluster min-label propagation,
  * [[Dedup.dedupClusters]]); this adds weighted importance —
  * PageRank — and local clustering structure — triangle counts — for
  * the graphs a data pipeline actually builds: co-purchase/
  * co-occurrence graphs, domain link graphs, dedup similarity graphs.
  */
object GraphOps {

  /** GENERIC CONNECTED COMPONENTS over an undirected edge frame —
    * the dedup-cluster core ([[Dedup.dedupClusters]]) exposed for
    * arbitrary graphs: iterative min-label propagation, each sweep
    * one fully-distributed join+aggregate with the cached edge list
    * exchange-free after the first sweep (the partitioned-cache
    * discipline documented at the shared core). Iteration count is
    * bounded by component DIAMETER — near-clique similarity graphs
    * converge in 2–3 sweeps; long-path graphs (chains, road-like
    * graphs) need ~diameter sweeps, so `maxIter` is a caller choice
    * (the 100 TB alternative for huge-diameter graphs is the
    * large-star/small-star contraction algorithm, out of scope while
    * no gated graph needs it). Edges: (src, dst), direction ignored.
    * Output: (id, component = min node id in the component) for every
    * node with at least one edge, ordered by id.
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20): DataFrame =
    Dedup.propagateMin(edges, "src", "dst", maxIter,
      es => es.select(col("src").as("id")).distinct()
        .withColumn("label", col("id")))
      .select(col("id"), col("label").as("component"))
      .orderBy("id")

  /** INCREMENTAL connected components — fold a new edge slice into an
    * existing component labeling WITHOUT rescanning the old graph
    * (the incremental-index discipline applied to graph state): new
    * edges are CONTRACTED onto their endpoints' current components
    * (one equi-join per endpoint against the label table; unseen
    * nodes label themselves), and the propagation then runs on the
    * contracted graph only — whose size is bounded by the number of
    * components the slice TOUCHES, not by the accumulated graph.
    * Old labels relabel through one broadcast-joinable (old → merged)
    * map; untouched components pass through byte-identical.
    *
    * Correct because component minima compose: the union graph's
    * component min is the min over its merged old components' minima
    * and its new nodes' ids — exactly what propagation over the
    * contracted graph computes. `foldComponents(cc(E₁), E₂)` equals
    * `cc(E₁ ∪ E₂)` row-for-row (gated t152; twin = the full-graph
    * closure). Requires `labels` to be a CONVERGED labeling (both
    * [[connectedComponents]] forms fail loudly otherwise).
    */
  def foldComponents(labels: DataFrame, newEdges: DataFrame,
      maxIter: Int = 20): DataFrame = {
    val (lbl, remap) = componentRemap(labels, newEdges, maxIter)
    labels
      .unionByName(lbl.join(labels, Seq("id"), "left_anti"))
      .join(remap, col("component") === col("oldc"), "left")
      .select(col("id"), coalesce(col("newc"), col("component")).as("component"))
      .orderBy("id")
  }

  /** DELTA form of [[foldComponents]] for per-key upsert maintenance
    * ([[graft.sinks.LakeWriter.readBucketedTableMerged]]): returns
    * ONLY the rows the slice TOUCHES — members of every merged
    * component (relabeled to the new minimum) plus the slice's new
    * nodes — so a maintained label table commits O(touched
    * components) per slice, never O(all labels). Layered
    * latest-key-wins over the old labels, the result equals
    * [[foldComponents]] verbatim (gated t153 through the streaming
    * intake).
    */
  def foldComponentsDelta(labels: DataFrame, newEdges: DataFrame,
      maxIter: Int = 20): DataFrame = {
    val (lbl, remap) = componentRemap(labels, newEdges, maxIter)
    val touchedOld = labels.join(remap, col("component") === col("oldc"))
      .select(col("id"), col("newc").as("component"))
    val newNodes = lbl.join(labels, Seq("id"), "left_anti")
      .join(remap, col("component") === col("oldc"), "left")
      .select(col("id"), coalesce(col("newc"), col("component")).as("component"))
    touchedOld.unionByName(newNodes).orderBy("id")
  }

  /** Shared contraction core of the fold forms: the slice's node
    * labels (unseen nodes label themselves) and the (old component →
    * merged component) map from propagation over the CONTRACTED
    * graph — whose size is bounded by the components the slice
    * touches, never the accumulated graph.
    */
  private def componentRemap(labels: DataFrame, newEdges: DataFrame,
      maxIter: Int): (DataFrame, DataFrame) = {
    val nodes = newEdges.select(col("src").as("id"))
      .unionByName(newEdges.select(col("dst").as("id"))).distinct()
    val lbl = nodes.join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"))
    val contracted = newEdges
      .join(lbl.select(col("id").as("src"), col("component").as("ca")), Seq("src"))
      .join(lbl.select(col("id").as("dst"), col("component").as("cb")), Seq("dst"))
      .select(col("ca").as("src"), col("cb").as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
    val remap = connectedComponents(contracted, maxIter)
      .select(col("id").as("oldc"), col("component").as("newc"))
    (lbl, remap)
  }

  /** Connected components by ALTERNATING big-star/small-star
    * contraction (Kiveris et al., "Connected Components in MapReduce
    * and Beyond", SoCC'14 — public algorithm) — the huge-diameter
    * lever [[connectedComponents]]'s scaladoc names: label
    * propagation needs DIAMETER-many sweeps (a 10⁶-hop path graph
    * needs 10⁶ rounds), the alternating contraction converges in
    * O(log n) rounds on real graphs because every round SHORTCUTS
    * edges toward the component minimum rather than walking them:
    *
    *  - big-star: every node u links its LARGER neighbors directly to
    *    m = min(N(u) ∪ u) — one groupBy(min) + one equi-join;
    *  - small-star: with edges oriented (small, large), every larger
    *    endpoint links itself and its smaller neighbors to its
    *    minimum neighbor — same shape.
    *
    * Fixed point ⟺ the edge set is a union of stars centered at each
    * component's minimum (the paper's invariant), which IS the
    * output. Each round is two partial-aggregating shuffles over the
    * shrinking edge set — no driver-side anything except the bounded
    * fixed-point probe (count + one limit-1 anti-join); lineage is
    * cut per round exactly as the propagation core does. Output
    * matches [[connectedComponents]] row-for-row (gated against the
    * same recursive-closure twin; differential spec on a 300-hop
    * chain that converges here in ≤15 rounds where propagation would
    * need 299).
    */
  def connectedComponentsBigStar(edges: DataFrame, maxIter: Int = 25): DataFrame = {
    var (e, eIds) = Dedup.checkpointTracked(canonicalEdges(edges))
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // big-star over the symmetric view (min table key renamed — a
      // self-referencing USING join on an aggregate child shares expr
      // ids with its source and resolves trivially-true)
      val sym = e.select(col("a").as("u"), col("b").as("v"))
        .unionByName(e.select(col("b").as("u"), col("a").as("v")))
      val lsMin = sym.groupBy("u").agg(min("v").as("mn"))
        .select(col("u").as("mu"), col("mn"))
      val ls = sym.join(lsMin, col("u") === col("mu"))
        .filter(col("v") > col("u"))
        .select(col("v").as("src"), least(col("mn"), col("u")).as("dst"))
      val (e1, e1Ids) = Dedup.checkpointTracked(canonicalEdges(ls))
      // small-star on the (small, large) orientation
      val ssMin = e1.groupBy("b").agg(min("a").as("mn"))
        .select(col("b").as("mb"), col("mn"))
      val ss = e1.join(ssMin, col("b") === col("mb"))
        .select(explode(array(
          struct(col("b").as("src"), col("mn").as("dst")),
          struct(col("a").as("src"), col("mn").as("dst")))).as("s"))
        .select(col("s.src").as("src"), col("s.dst").as("dst"))
      val (e2, e2Ids) = Dedup.checkpointTracked(canonicalEdges(ss))
      Dedup.freeRdds(e1, e1Ids)
      // fixed-point probe: same cardinality + no edge outside the old
      // set ⇒ identical distinct sets (bounded: count + limit-1 probe)
      converged = e2.count() == e.count() &&
        e2.except(e).limit(1).collect().isEmpty
      Dedup.freeRdds(e, eIds)
      e = e2; eIds = e2Ids
      i += 1
    }
    require(converged,
      s"connectedComponentsBigStar did not reach its star fixed point in $maxIter rounds")
    // the node universe comes from the ORIGINAL edges: canonicalEdges
    // drops self-loops, so a node whose only edge is (v, v) would
    // otherwise vanish — connectedComponents keeps it, and the two
    // forms are documented row-for-row identical
    val nodes = edges.select(col("src").as("id"))
      .unionByName(edges.select(col("dst").as("id"))).distinct()
    val labels = e.select(col("b").as("id"), col("a").as("component"))
      .unionByName(e.select(col("a").as("id"), col("a").as("component")))
      .distinct()
    nodes.join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"))
      .orderBy("id")
  }

  /** INTEGER-SCALED PageRank: `iters` fixed power iterations of
    * s' = 150000 + Σ_in (85·s_src) div (100·deg_src), scores in
    * micro-units (1.0 ≡ 1,000,000) — the standard 0.15/0.85 damped
    * update with every per-edge contribution FLOORED to an integer
    * before the sum. Floats would accumulate per-node sums in
    * engine-chosen order (last-ulp divergence); integer sums are
    * order-free, so the result is bit-identical in every engine and
    * across any partitioning — the [[Exact]] discipline applied to a
    * graph iteration. The floor loses < 1 micro-unit per in-edge,
    * irrelevant for ranking.
    *
    * Scale shape: each iteration is one edge⋈score equi-join on src
    * (degree table rides along, AQE-skew-splittable for hub nodes) +
    * a partial-aggregating in-neighbor sum — the Pregel cost shape,
    * no driver-side anything; `localCheckpoint` per iteration keeps
    * lineage flat. Edges: DIRECTED (src, dst); callers emit both
    * directions for undirected graphs. Dangling nodes (no out-edges)
    * contribute nothing, standard simplified PageRank.
    *
    * Output: (id, s) — micro-unit scores, deterministic.
    */
  def pageRankInt(edges: DataFrame, iters: Int = 3): DataFrame = {
    require(iters >= 1, "at least one power iteration")
    val e = edges.select(col("src"), col("dst")).distinct().localCheckpoint()
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg")).localCheckpoint()
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id"))).distinct().localCheckpoint()
    var scores = nodes.withColumn("s", lit(1000000L))
    for (_ <- 1 to iters) {
      val contrib = e
        .join(scores.withColumnRenamed("id", "src"), "src")
        .join(deg, "src")
        .select(col("dst").as("id"),
          expr("(85 * s) div (100 * deg)").as("c"))
        .groupBy("id").agg(sum("c").as("sc"))
      scores = nodes.join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit(150000L) + coalesce(col("sc"), lit(0L))).as("s"))
        .localCheckpoint()
    }
    scores.orderBy("id")
  }

  /** Per-node TRIANGLE counts over an UNDIRECTED edge frame — the
    * local-clustering signal (spam rings and boilerplate farms are
    * triangle-dense; organic link neighborhoods are sparse). Input
    * edges in either or both orientations; self-loops ignored.
    *
    * The join is the standard ORIENTED enumeration: canonicalize
    * every edge to a < b, then wedges (a<b)⋈(b<c) close against the
    * canonical edge (a,c) — each triangle counted exactly once, and
    * the a<b<c ordering keeps the wedge fan-out off the heavy side
    * of skewed degree distributions (a hub's wedges split across its
    * LOWER-id neighbors instead of all landing on the hub). Output:
    * (id, n_triangles) for every node in some edge.
    */
  def triangleCounts(edges: DataFrame): DataFrame =
    triangleCountsFrom(canonicalEdges(edges).localCheckpoint())

  /** [[triangleCounts]] with a DEGREE CAP — the 100× lever for the
    * Σ deg² wedge bound exact enumeration carries: nodes whose
    * undirected degree exceeds `maxDeg` (hubs — a viral page, a
    * boilerplate template every page links) are removed WITH their
    * edges before wedge generation, so the wedge volume is bounded by
    * |E|·maxDeg instead of the hub's deg². This is the standard
    * approximation for local-clustering signals at web scale: hub
    * triangles are the least informative (everything closes through a
    * hub) and the costliest; the capped count is EXACT on the capped
    * subgraph, which is the semantics the gate twin replicates.
    * Degrees are measured on the full input graph, so a node's hub
    * edges count toward its own degree; output covers the nodes of
    * the CAPPED edge set (a node connected only to hubs drops out
    * with its edges).
    */
  def triangleCountsCapped(edges: DataFrame, maxDeg: Int): DataFrame = {
    require(maxDeg >= 1, "maxDeg must be positive")
    val canon = canonicalEdges(edges).localCheckpoint()
    val deg = canon.select(col("a").as("id"))
      .unionByName(canon.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    val keep = deg.filter(col("deg") <= maxDeg).select("id")
    val capped = canon
      .join(keep.withColumnRenamed("id", "a"), Seq("a"), "left_semi")
      .join(keep.withColumnRenamed("id", "b"), Seq("b"), "left_semi")
      .select("a", "b")
      .localCheckpoint()
    triangleCountsFrom(capped)
  }

  /** [[triangleCounts]] with DOULION-style edge sampling (Tsourakakis
    * et al., KDD 2009) — the second 100 TB lever next to the degree
    * cap: keep each canonical edge iff a deterministic content hash
    * falls under `p`, count triangles EXACTLY on the sampled
    * subgraph, and scale by 1/p³ (a triangle survives iff all three
    * edges do). Candidate volume drops ~p² per wedge with an
    * unbiased estimate (~3% relative error on the co-purchase graph
    * at p = 0.25, measured). The sampling is hash-Bernoulli, no PRNG
    * — re-runs and the oracle twin reproduce the same subgraph
    * bit-for-bit (the t121 accept-test discipline). Output:
    * (id, n_sampled, est_triangles) for nodes of the SAMPLED edge
    * set; `est_triangles` is quantized to 4 dp.
    */
  def triangleCountsSampled(
      edges: DataFrame, p: Double = 0.25, seed: String = "tri"): DataFrame = {
    require(p > 0.0 && p <= 1.0, "sampling rate must be in (0, 1]")
    val cut = math.floor(p * 4294967296.0).toLong
    val sampled = canonicalEdges(edges)
      .filter(conv(substring(md5(concat_ws(":", lit(seed),
        col("a").cast("string"), col("b").cast("string"))), 1, 8), 16, 10)
        .cast("long") < cut)
      .localCheckpoint()
    val inv = 1.0 / (p * p * p)
    triangleCountsFrom(sampled)
      .select(col("id"), col("n_triangles").as("n_sampled"),
        Exact.quant4(col("n_triangles").cast("double") * lit(inv))
          .as("est_triangles"))
      .orderBy("id")
  }

  /** SINGLE-SOURCE (multi-seed) SHORTEST PATHS with integer weights,
    * run for EXACTLY `rounds` Bellman-Ford relaxation rounds: after
    * round r, `dist(id)` is the exact minimum cost over paths of
    * ≤ r edges from the nearest seed — the weighted generalization of
    * [[bfsLevels]] ("cheapest route to a seed within k hops").
    * Each round is ONE equi-join of the current distance table
    * against the edge list plus one min-combining groupBy (partial
    * aggregation collapses duplicate relaxations map-side), so the
    * per-round cost is frontier-edges, never |V|·|E|. Integer weights
    * keep the result engine-portable bit-for-bit (the [[Exact]]
    * discipline — float path sums would depend on addition order);
    * the explicit round count makes the computation replayable by the
    * oracle twin (a hop-bounded recursive CTE). Edges: DIRECTED
    * (src, dst, w); w ≥ 0 expected (negative weights still relax
    * correctly within the hop bound, but lose the "shortest within
    * k hops" reading). Nodes beyond `rounds` hops are absent. Output:
    * (id, dist), seeds at 0.
    */
  def ssspInt(edges: DataFrame, sources: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 0, "rounds must be non-negative")
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"), col("w").cast("long").as("w"))
      .groupBy("src", "dst").agg(min("w").as("w"))
      .localCheckpoint()
    var dist = sources.select(col("id").cast("long").as("id")).distinct()
      .select(col("id"), lit(0L).as("dist")).localCheckpoint()
    for (_ <- 1 to rounds) {
      val relaxed = dist.join(e, col("id") === col("src"))
        .select(col("dst").as("id"), (col("dist") + col("w")).as("dist"))
      dist = dist.unionByName(relaxed)
        .groupBy("id").agg(min("dist").as("dist"))
        .localCheckpoint()
    }
    dist.orderBy("id")
  }

  /** PERSONALIZED PageRank — [[pageRankInt]] with the restart mass
    * concentrated on a SEED set instead of spread uniformly ("rank
    * pages by proximity to the trusted seeds", the TrustRank /
    * seed-expansion shape used for crawl frontier scoring and
    * related-entity retrieval). Same exact-integer discipline: scores
    * in micro-units, every per-edge contribution floored before the
    * order-free integer sum, s' = (seed ? 150000 : 0) + Σ_in
    * (85·s_src) div (100·deg_src), seeds start at 1,000,000 and
    * non-seeds at 0. Per iteration: one edge⋈score equi-join + one
    * partial-aggregating sum — the Pregel cost shape, nothing
    * driver-side. Output: (id, s) micro-unit proximity scores,
    * deterministic and bit-identical across engines.
    */
  def pageRankPersonalizedInt(edges: DataFrame, sources: DataFrame,
      iters: Int = 3): DataFrame = {
    require(iters >= 1, "at least one power iteration")
    val e = edges.select(col("src"), col("dst")).distinct().localCheckpoint()
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg")).localCheckpoint()
    val seeds = sources.select(col("id")).distinct()
      .withColumn("is_seed", lit(1L))
    val base = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id"))).distinct()
      .join(seeds, Seq("id"), "left")
      .select(col("id"), coalesce(col("is_seed"), lit(0L)).as("is_seed"))
      .localCheckpoint()
    var scores = base.select(col("id"), (col("is_seed") * 1000000L).as("s"))
    for (_ <- 1 to iters) {
      val contrib = e
        .join(scores.withColumnRenamed("id", "src"), "src")
        .join(deg, "src")
        .select(col("dst").as("id"),
          expr("(85 * s) div (100 * deg)").as("c"))
        .groupBy("id").agg(sum("c").as("sc"))
      scores = base.join(contrib, Seq("id"), "left")
        .select(col("id"),
          (col("is_seed") * 150000L + coalesce(col("sc"), lit(0L))).as("s"))
        .localCheckpoint()
    }
    scores.orderBy("id")
  }

  /** LINK PREDICTION by common-neighbor counting — for every
    * NON-ADJACENT pair with at least `minCommon` shared neighbors,
    * the two classic integer scores: `common_neighbors` (the
    * strongest simple predictor, Liben-Nowell & Kleinberg 2003) and
    * `deg_product` (preferential attachment). The candidate set is
    * the oriented wedge enumeration [[triangleCounts]] uses — pairs
    * (a < b) sharing a middle node, generated with the same
    * lower-id-splits-the-fanout skew defense and bounded by Σ deg²
    * (compose with [[triangleCountsCapped]]'s degree cap upstream
    * for hub-heavy graphs); existing edges leave via one anti-join.
    * All integers — engine-portable without quantization (the
    * float Adamic-Adar refinement would break the exactness
    * contract for a constant ranking gain). Output:
    * (id_a, id_b, common_neighbors, deg_product), best first.
    */
  def linkPrediction(edges: DataFrame, minCommon: Long): DataFrame = {
    require(minCommon >= 1, "minCommon must be positive")
    val canon = canonicalEdges(edges).localCheckpoint()
    val adj = canon.select(col("a").as("u"), col("b").as("v"))
      .unionByName(canon.select(col("b").as("u"), col("a").as("v")))
    val cand = adj.as("x")
      .join(adj.as("y"), col("x.u") === col("y.u") && col("x.v") < col("y.v"))
      .select(col("x.v").as("a"), col("y.v").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("common_neighbors"))
      .filter(col("common_neighbors") >= minCommon)
      .join(canon, Seq("a", "b"), "left_anti")
    val deg = adj.groupBy("u").agg(count(lit(1)).as("deg"))
    cand
      .join(deg.select(col("u").as("a"), col("deg").as("deg_a")), Seq("a"))
      .join(deg.select(col("u").as("b"), col("deg").as("deg_b")), Seq("b"))
      .select(col("a").as("id_a"), col("b").as("id_b"),
        col("common_neighbors"), (col("deg_a") * col("deg_b")).as("deg_product"))
      .orderBy(col("common_neighbors").desc, col("id_a"), col("id_b"))
  }

  /** DETERMINISTIC seeded random walks — `steps` steps from every
    * start node, the next hop at step t chosen as the neighbor
    * minimizing md5(seed:t:cur:neighbor). Hash-argmin instead of a
    * PRNG makes every walk REPRODUCIBLE across engines, retries, and
    * partitionings (the t121/t136 hash-Bernoulli discipline applied
    * to path sampling — the walk corpus that feeds DeepWalk-style
    * embedding trainers must be replayable or the training set is
    * unauditable). Each step is one frontier⋈adjacency equi-join
    * plus a per-walk row_number argmin — the window partitions by
    * walk id, so a million concurrent walks spread across the
    * cluster and no step ever materializes more than frontier-edges
    * rows. Walks at a degree-0 node stop early (no padding rows).
    * EDGE SEMANTICS: the input is canonicalized UNDIRECTED first
    * (via [[canonicalEdges]] — both orientations merged, duplicates
    * dropped, self-loops removed), so walks traverse every edge in
    * both directions and never take a self-loop step; a caller with
    * a genuinely directed graph must not use this walker as-is.
    * Output: the full trace (walk_id = start node, step, node),
    * step 0 = the start.
    */
  def randomWalksDet(edges: DataFrame, starts: DataFrame, steps: Int,
      seed: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(steps >= 0, "steps must be non-negative")
    val canon = canonicalEdges(edges)
    val adj = canon.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(canon.select(col("b").as("src"), col("a").as("dst")))
      .localCheckpoint()
    var cur = starts.select(col("id").cast("long").as("node")).distinct()
      .select(col("node").as("walk_id"), lit(0L).as("step"), col("node"))
      .localCheckpoint()
    var trace = cur
    for (st <- 1 to steps) {
      val next = cur.join(adj, col("node") === col("src"))
        .select(col("walk_id"), col("dst"),
          md5(concat_ws(":", lit(seed), lit(st.toString),
            col("node").cast("string"), col("dst").cast("string"))).as("h"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("walk_id").orderBy(col("h"), col("dst"))))
        .filter(col("rn") === 1)
        .select(col("walk_id"), lit(st.toLong).as("step"), col("dst").as("node"))
        .localCheckpoint()
      trace = trace.unionByName(next)
      cur = next
    }
    trace.orderBy("walk_id", "step")
  }

  /** Canonical undirected edge set: a < b, self-loops dropped. */
  private def canonicalEdges(edges: DataFrame): DataFrame =
    edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()

  /** Oriented a<b<c wedge closure + per-corner counting — shared by
    * the exact and degree-capped variants so the enumeration rule
    * can never drift between them. `canon` is consumed four times;
    * callers checkpoint it.
    */
  private def triangleCountsFrom(canon: DataFrame): DataFrame = {
    // NOTE (r17, measured): degree-oriented wedge enumeration (orient
    // each edge toward its (deg, id)-larger endpoint, wedge only at
    // the minimal corner) was implemented and A/B'd here — shuffle MB
    // did not move (65.8 → 65.2 on the t120 graph) and the two added
    // degree joins cost ~2 s on each triangle gate. The a<b form below
    // IS already an orientation (by id), and the co-purchase graph's
    // near-uniform degrees leave nothing for degree ordering to win;
    // skewed-degree graphs route to triangleCountsCapped/Sampled.
    val tri = canon.as("e1")
      .join(canon.as("e2"), col("e1.b") === col("e2.a"))
      .join(canon.as("e3"),
        col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    // One pass over the closed triangles: explode the three corners
    // of each row instead of unioning three projections of `tri` —
    // the union form re-evaluated the ENTIRE wedge+closure join
    // subtree once per corner (Spark has no cross-arm common-subtree
    // reuse; plan-audited r18: three SortMergeJoin pairs in one t120
    // plan, 3× the enumeration work and 3× its exchanges). The
    // explode is narrow, partial aggregation collapses the 3-per-
    // triangle fan-out map-side, and the aggregate is unchanged.
    val perNode = tri
      .select(explode(array(col("x"), col("y"), col("z"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_triangles"))
    val nodes = canon.select(col("a").as("id"))
      .unionByName(canon.select(col("b").as("id"))).distinct()
    nodes.join(perNode, Seq("id"), "left")
      .select(col("id"), coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
      .orderBy("id")
  }

  /** K-CORE peeling, run for EXACTLY `rounds` rounds: each round
    * drops nodes whose degree in the CURRENT residual graph is < k,
    * then restricts the edge set to surviving endpoints (one degree
    * aggregation + two semi-joins per round — all on the edge key,
    * no global collection). With enough rounds this is the classic
    * k-core fixed point (dense-community extraction / spam-farm
    * coreness); the round count is an explicit parameter rather than
    * a convergence loop so the computation is REPLAYABLE bit-for-bit
    * by any engine running the same number of rounds — the oracle
    * twin unrolls the identical rounds as chained CTEs. Output:
    * (id, deg) for surviving nodes with their residual-graph degree.
    */
  def kCore(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1, "k and rounds must be positive")
    var e = canonicalEdges(edges).localCheckpoint()
    for (_ <- 1 to rounds) {
      val deg = e.select(col("a").as("id"))
        .unionByName(e.select(col("b").as("id")))
        .groupBy("id").agg(count(lit(1)).as("deg"))
      val live = deg.filter(col("deg") >= k).select("id").localCheckpoint()
      e = e
        .join(live.withColumnRenamed("id", "a"), Seq("a"), "left_semi")
        .join(live.withColumnRenamed("id", "b"), Seq("b"), "left_semi")
        .select("a", "b")
        .localCheckpoint()
    }
    e.select(col("a").as("id"))
      .unionByName(e.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
      .filter(col("deg") >= k)
      .orderBy("id")
  }

  /** ROOT + DEPTH for every node of a parent-pointer FOREST (org
    * charts, bill-of-materials, thread trees) by POINTER DOUBLING:
    * each round joins the ancestor map onto itself, so a node's known
    * ancestor jumps 1 → 2 → 4 → … levels and a depth-D forest
    * resolves in ⌈log₂ D⌉ self-joins instead of D sequential parent
    * hops — the recursive-CTE workload made shuffle-bounded. State is
    * (id, anc, d); a row is final when `anc` has no parent. Fails
    * loudly at `maxIter` (2^30-deep chains are data bugs). Output:
    * (id, root, depth), roots at depth 0.
    */
  def forestRootDepth(parents: DataFrame, maxIter: Int = 30): DataFrame = {
    val p = parents.select(col("id").cast("long").as("id"),
      col("parent").cast("long").as("parent")).localCheckpoint()
    val hasPar = p.filter(col("parent").isNotNull)
    // ids that are parents of others but have no own row are implicit roots
    val roots = p.select(col("parent").as("id")).distinct()
      .join(p.select("id"), Seq("id"), "left_anti")
      .unionByName(p.filter(col("parent").isNull).select("id"))
      .filter(col("id").isNotNull).distinct().localCheckpoint()
    var state = hasPar.select(col("id"), col("parent").as("anc"), lit(1L).as("d"))
      .localCheckpoint()
    var done = false
    var it = 0
    while (!done) {
      it += 1
      require(it <= maxIter, s"forest deeper than 2^$maxIter — cycle or data bug")
      val jumped = state.as("s")
        .join(state.as("t"), col("s.anc") === col("t.id"), "left")
        .select(col("s.id"),
          coalesce(col("t.anc"), col("s.anc")).as("anc"),
          (col("s.d") + coalesce(col("t.d"), lit(0L))).as("d"))
        .localCheckpoint()
      done = jumped.as("j").join(state.as("s"), Seq("id"))
        .filter(col("j.anc") =!= col("s.anc")).isEmpty
      state = jumped
    }
    state.select(col("id"), col("anc").as("root"), col("d").as("depth"))
      .unionByName(roots.select(col("id"), col("id").as("root"), lit(0L).as("depth")))
      .orderBy("id")
  }

  /** MULTI-SOURCE BFS run for EXACTLY `rounds` rounds: every node's
    * minimum hop distance (≤ rounds) to the nearest source — the
    * "how far is each page from a seed domain" / "blast radius of a
    * bad record" query. Level-synchronous frontier expansion: each
    * round joins ONLY the newest frontier against the edge list (one
    * equi-join + an anti-join against already-settled nodes), so
    * total work is Σ |frontier_i| · avg-degree — never |V|·rounds.
    * The round count is an explicit parameter (not a convergence
    * loop) so any engine replays it bit-for-bit; nodes beyond
    * `rounds` hops are absent from the output by design. Output:
    * (id, dist), sources at dist 0.
    */
  def bfsLevels(edges: DataFrame, sources: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 0, "rounds must be non-negative")
    val canon = canonicalEdges(edges)
    // undirected adjacency: both orientations of each canonical edge
    val adj = canon.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(canon.select(col("b").as("src"), col("a").as("dst")))
      .localCheckpoint()
    var settled = sources.select(col("id").cast("long").as("id")).distinct()
      .select(col("id"), lit(0L).as("dist")).localCheckpoint()
    var frontier = settled
    for (r <- 1 to rounds if !frontier.isEmpty) {
      val next = frontier.join(adj, col("id") === col("src"))
        .select(col("dst").as("id")).distinct()
        .join(settled, Seq("id"), "left_anti")
        .select(col("id"), lit(r.toLong).as("dist"))
        .localCheckpoint()
      settled = settled.unionByName(next).localCheckpoint()
      frontier = next
    }
    settled.orderBy("id")
  }

  /** HITS hubs & authorities (Kleinberg) on a DIRECTED bipartite
    * edge list, `iters` mutual-reinforcement rounds in EXACT integer
    * arithmetic: a(d) = Σ h(s) over in-edges, h(s) = Σ a(d) over
    * out-edges, each side renormalized to max = `scale` by INTEGER
    * division (floor) — the same engine-portable trick as the t119
    * integer PageRank, so the twin unrolls the identical CTEs and
    * matches bit-for-bit. Per round: one equi-join of the edge list
    * with a node-sized score table + one partial-aggregating groupBy
    * (shuffle ≤ |nodes| rows/partition), and the normalizing max is a
    * ONE-ROW broadcast — nothing driver-side, nothing quadratic.
    * Overflow bound: post-normalize scores ≤ scale, so a raw sum ≤
    * scale·maxDegree and the scale·sum product stays ≤ 1e6·1e6·maxDeg
    * — within long for maxDegree < 9e6 (assert-free by domain; use a
    * smaller scale for denser graphs). Output one row per node:
    * (role 'hub'|'authority', id, score).
    */
  def hits(edges: DataFrame, iters: Int, scale: Long = 1000000L): DataFrame = {
    require(iters >= 1, "need at least one HITS round")
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).distinct().localCheckpoint()
    // raw scores → max-normalized integers: floor(raw·scale / max),
    // one-row max broadcast, integer `div` (identical to DuckDB //)
    def normalize(raw: DataFrame): DataFrame =
      raw.crossJoin(broadcast(raw.agg(max("raw").as("mx"))))
        .select(col("id"), expr(s"raw * ${scale}L div mx").as("score"))
    var hubs = e.select(col("src").as("id")).distinct()
      .withColumn("score", lit(scale))
    var auths: DataFrame = null
    for (_ <- 1 to iters) {
      auths = normalize(e.join(hubs, e("src") === hubs("id"))
        .groupBy(col("dst").as("id")).agg(sum("score").as("raw")))
      hubs = normalize(e.join(auths, e("dst") === auths("id"))
        .groupBy(col("src").as("id")).agg(sum("score").as("raw")))
    }
    hubs.select(lit("hub").as("role"), col("id"), col("score"))
      .unionByName(auths.select(lit("authority").as("role"), col("id"), col("score")))
      .orderBy("role", "id")
  }

  /** DETERMINISTIC MAXIMAL INDEPENDENT SET — Luby's algorithm (Luby
    * 1986, public) with md5 hash PRIORITIES instead of a PRNG: in
    * round r, a node joins the MIS iff its (md5(seed:r:id), id) pair
    * is strictly smaller than every live neighbor's; the node and its
    * neighbors then leave the graph, and nodes whose last live edge
    * vanished join the MIS as isolates the following round. Hash
    * priorities make every round REPLAYABLE across engines, retries,
    * and partitionings (the hash-Bernoulli discipline applied to
    * symmetry breaking) — and Luby's analysis holds because the
    * per-round priorities are independent across rounds. Each round
    * is one partial-aggregating neighbor-min plus two anti-joins over
    * the SHRINKING edge set; expected O(log n) rounds. Runs exactly
    * `rounds` rounds (vacuous once the graph is empty — the twin
    * unrolls the same fixed count) and FAILS LOUDLY if edges remain.
    * Input (src, dst), treated undirected. Output: (id) — the MIS.
    */
  def maximalIndependentSet(edges: DataFrame, seed: String,
      rounds: Int = 12): DataFrame = {
    require(rounds >= 1, "need at least one round")
    var (live, liveIds) = Dedup.checkpointTracked(canonicalEdges(edges))
    var remaining = live.select(col("a").as("id"))
      .unionByName(live.select(col("b").as("id"))).distinct().localCheckpoint()
    var mis = remaining.limit(0)
    for (r <- 1 to rounds) {
      def prio(idc: Column): Column =
        md5(concat_ws(":", lit(seed), lit(r.toString), idc.cast("string")))
      val sym = live.select(col("a").as("u"), col("b").as("v"))
        .unionByName(live.select(col("b").as("u"), col("a").as("v")))
      val minN = sym
        .groupBy("u")
        .agg(min(struct(prio(col("v")).as("ph"), col("v").as("v"))).as("mn"))
        .select(col("u").as("id"), col("mn"))
      val isolated = remaining.join(minN.select("id"), Seq("id"), "left_anti")
      val selected = minN
        .filter(struct(prio(col("id")).as("ph"), col("id").as("v")) < col("mn"))
        .select("id")
      mis = mis.unionByName(selected).unionByName(isolated).localCheckpoint()
      val removed = selected.unionByName(
          sym.join(selected.select(col("id").as("u")), Seq("u"), "left_semi")
            .select(col("v").as("id")))
        .distinct().localCheckpoint()
      // remaining references the OLD live (through isolated/minN):
      // materialize it before that checkpoint is freed
      remaining = remaining.join(isolated, Seq("id"), "left_anti")
        .join(removed, Seq("id"), "left_anti").localCheckpoint()
      val (live2, live2Ids) = Dedup.checkpointTracked(
        live.join(removed.select(col("id").as("a")), Seq("a"), "left_anti")
          .join(removed.select(col("id").as("b")), Seq("b"), "left_anti"))
      Dedup.freeRdds(live, liveIds)
      live = live2; liveIds = live2Ids
    }
    require(live.isEmpty,
      s"maximalIndependentSet: edges remain after $rounds rounds — raise the bound")
    // nodes never touched by any edge-removal path but still remaining
    // (graph emptied exactly at the last round) are isolates now
    mis.unionByName(remaining).orderBy("id")
  }

  /** WEIGHTED integer PageRank — [[pageRankInt]] with per-edge
    * weights: each source spreads 85% of its score proportionally to
    * edge weight, every contribution FLOORED to an integer before the
    * order-free sum: s' = 150000 + Σ_in (85·s_src·w) div (100·W_src),
    * W_src = Σ out-weights. Parallel edges merge their weights first
    * (one aggregate), so multi-edges behave as one heavier edge.
    * Same Pregel cost shape as the unweighted form: one edge⋈score
    * equi-join + partial-aggregating sum per iteration, weights and
    * weight-sums riding the edge side. Output: (id, s) micro-units.
    */
  def pageRankWeightedInt(edges: DataFrame, iters: Int = 3): DataFrame = {
    require(iters >= 1, "at least one power iteration")
    val e = edges.select(col("src"), col("dst"), col("w").cast("long").as("w"))
      .groupBy("src", "dst").agg(sum("w").as("w")).localCheckpoint()
    val wout = e.groupBy("src").agg(sum("w").as("wsum")).localCheckpoint()
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id"))).distinct().localCheckpoint()
    var s = nodes.withColumn("s", lit(1000000L))
    for (_ <- 1 to iters) {
      val contrib = e.join(s, e("src") === s("id")).join(wout, Seq("src"))
        .groupBy(col("dst").as("nid"))
        .agg(sum(expr("(85 * s * w) DIV (100 * wsum)")).as("sc"))
      s = nodes.join(contrib, nodes("id") === contrib("nid"), "left")
        .select(col("id"),
          (lit(150000L) + coalesce(col("sc"), lit(0L))).as("s"))
        .localCheckpoint()
    }
    s.orderBy("id")
  }

  /** DEGREE ASSORTATIVITY — the Pearson correlation between the
    * degrees at the two ends of every edge (Newman 2002, public):
    * positive = hubs attach to hubs (social shape), negative = hubs
    * attach to leaves (star/infrastructure shape). Computed over the
    * SYMMETRIC directed-pair view (each undirected edge contributes
    * both orientations — the standard convention, and it makes the
    * two marginals identical), with the [[graft.ops.Relational]]
    * integer-moment discipline: one degree aggregate, two broadcast-
    * able joins back to the edge list, six DECIMAL(38,0) sums, ONE
    * final quantized IEEE division. Output: (n_pairs, assortativity).
    */
  def degreeAssortativity(edges: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    val canon = canonicalEdges(edges).localCheckpoint()
    val sym = canon.select(col("a").as("u"), col("b").as("v"))
      .unionByName(canon.select(col("b").as("u"), col("a").as("v")))
    val deg = sym.groupBy("u").agg(count(lit(1)).as("deg"))
    sym
      .join(deg.select(col("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("u").as("v"), col("deg").as("dv")), Seq("v"))
      .select(col("du").cast(dec).as("x"), col("dv").cast(dec).as("y"))
      .agg(count(lit(1)).cast(dec).as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      .select(col("n").cast("long").as("n_pairs"),
        graft.ops.Exact.quant6(
          (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
              (col("n") * col("syy") - col("sy") * col("sy")).cast("double")))
          .as("assortativity"))
  }

  /** ANCESTOR CLOSURE of a forest by REPEATED SQUARING: all proper
    * (descendant, ancestor) pairs in ⌈log₂ depth⌉ self-join rounds —
    * P ← P ∪ (P ∘ P) doubles the reachable ancestor distance per
    * round, vs one join per LEVEL for naive parent-chasing. The
    * closure has Σ depth(v) rows regardless of how it's computed
    * (bounded by n·maxDepth — forests in data systems are shallow:
    * org charts, BOM trees, category taxonomies), so the win is
    * ROUND COUNT, not volume: depth 20 needs 5 shuffles, not 20.
    * Input (child, parent) one parent per child; lineage cut per
    * round. FAILS LOUDLY (like [[maximalIndependentSet]]'s round
    * bound) if the forest is deeper than `maxDepth`: a truncated
    * closure would silently under-roll every downstream subtree
    * aggregate, so completeness is asserted with one anti-join — a
    * maximal ancestor that still appears as a child means an
    * un-traversed level remains.
    */
  def ancestorClosure(parents: DataFrame, maxDepth: Int): DataFrame = {
    require(maxDepth >= 1, "maxDepth must be positive")
    val edges = parents.select(col("child").cast("long").as("id"),
      col("parent").cast("long").as("anc")).distinct().localCheckpoint()
    var p = edges
    var reach = 1
    while (reach < maxDepth) {
      val hop = p.select(col("id").as("_m"), col("anc").as("_a2"))
      p = p.unionByName(
          p.join(hop, col("anc") === col("_m"))
            .select(col("id"), col("_a2").as("anc")))
        .distinct().localCheckpoint()
      reach *= 2
    }
    // completeness = fixed point: one more parent hop must add no new
    // (id, anc) pair. Costs one join over the closure (Σ depth rows,
    // not the fact table) and turns "deeper than maxDepth" from a
    // silent wrong answer into a loud failure.
    val oneMore = p
      .join(edges.select(col("id").as("_m"), col("anc").as("_a2")),
        col("anc") === col("_m"))
      .select(col("id"), col("_a2").as("anc"))
    require(oneMore.join(p, Seq("id", "anc"), "left_anti").limit(1).isEmpty,
      s"ancestorClosure: forest deeper than maxDepth=$maxDepth — " +
        "closure would be silently truncated; raise maxDepth")
    p
  }

  /** SUBTREE AGGREGATION over a forest — every node's descendant
    * count and integer value sum INCLUDING itself (the BOM-explosion
    * / org-rollup shape: "total cost under each assembly", "headcount
    * under each manager"). One [[ancestorClosure]] (log-depth
    * rounds), identity pairs unioned in, then a single
    * partial-aggregating groupBy on the ancestor — no recursion at
    * query time, no driver loops over levels. `values`: (id, v).
    * Output: (id, n_nodes, subtree_v).
    */
  def subtreeAggInt(parents: DataFrame, values: DataFrame,
      maxDepth: Int): DataFrame = {
    val vals = values.select(col("id").cast("long").as("id"),
      col("v").cast("long").as("v"))
    val pairs = ancestorClosure(parents, maxDepth)
      .unionByName(vals.select(col("id"), col("id").as("anc")))
      .distinct()
    pairs.join(vals, "id")
      .groupBy(col("anc").as("id"))
      .agg(count(lit(1)).as("n_nodes"), sum("v").as("subtree_v"))
      .orderBy("id")
  }
}
