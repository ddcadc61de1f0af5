package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over relational edge frames. The engine already
  * does connected components (the dedup-cluster min-label propagation,
  * [[Dedup.dedupClusters]]); this adds weighted importance —
  * PageRank — for the graphs a data pipeline actually builds:
  * co-purchase/co-occurrence graphs, domain link graphs, dedup
  * similarity graphs.
  */
object GraphOps {

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
}
