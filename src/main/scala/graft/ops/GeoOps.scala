package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spatial/grid operators. The reference has no geo surface; these are
  * the distance-join shapes a training-data pipeline needs (e.g.
  * joining records by embedding-grid cell or geo cell) expressed with
  * the grid-bucket pattern: points land in integer cells of side `d`,
  * candidate pairs come from the 3×3 neighbor-cell equi-join, and the
  * exact distance predicate prunes the candidates. No cross join at
  * any scale — the shuffle key is the cell, and a pair is produced by
  * exactly ONE cell match (the probe side is replicated to its 9
  * neighbors, the build side keeps its home cell), so no dedup pass
  * is needed.
  */
object GeoOps {

  /** All pairs (a.id < b.id) of `points` (id, x, y — integer coords)
    * within CHEBYSHEV distance `d` (|dx| ≤ d AND |dy| ≤ d — the
    * square-window match; an L2 predicate drops in the same frame).
    * Output: (id_a, id_b, dx, dy) sorted. Skew note: a hot cell
    * (many co-located points) concentrates its own pairs by
    * construction — that is output skew, not join skew; AQE splits
    * the oversized post-join partitions.
    */
  def chebyshevPairs(points: DataFrame, d: Int): DataFrame = {
    require(d >= 1, "distance must be positive")
    val cellX = floor(col("x") / d).cast("long")
    val cellY = floor(col("y") / d).cast("long")
    val build = points.select(col("id").as("id_b"), col("x").as("xb"),
      col("y").as("yb"), cellX.as("cx"), cellY.as("cy"))
    val probe = points.select(col("id").as("id_a"), col("x").as("xa"),
      col("y").as("ya"), cellX.as("pcx"), cellY.as("pcy"))
      .withColumn("ox", explode(sequence(lit(-1), lit(1))))
      .withColumn("oy", explode(sequence(lit(-1), lit(1))))
      .select(col("id_a"), col("xa"), col("ya"),
        (col("pcx") + col("ox")).as("cx"), (col("pcy") + col("oy")).as("cy"))
    probe.join(build, Seq("cx", "cy"))
      .filter(col("id_a") < col("id_b") &&
        abs(col("xa") - col("xb")) <= d && abs(col("ya") - col("yb")) <= d)
      .select(col("id_a"), col("id_b"),
        (col("xb") - col("xa")).as("dx"), (col("yb") - col("ya")).as("dy"))
      .orderBy("id_a", "id_b")
  }

  /** NEAREST NEIGHBOR within Chebyshev radius `d`: for each point,
    * the closest OTHER point (min distance, then min id — fully
    * deterministic), or no row if none is within `d`. Same 3×3
    * neighbor-cell candidate join as [[chebyshevPairs]], then ONE
    * `min(struct(dist, id))` aggregate per point — argmin as a
    * partial-aggregating fold (each partition ships one candidate
    * per probe point), never a per-point sort. This is the spatial
    * analogue of embedding top-1 serving: candidates from a cell
    * structure, exact refine, bounded state per key.
    */
  def nearestNeighbor(points: DataFrame, d: Int): DataFrame = {
    require(d >= 1, "distance must be positive")
    val cellX = floor(col("x") / d).cast("long")
    val cellY = floor(col("y") / d).cast("long")
    val build = points.select(col("id").as("id_b"), col("x").as("xb"),
      col("y").as("yb"), cellX.as("cx"), cellY.as("cy"))
    val probe = points.select(col("id").as("id_a"), col("x").as("xa"),
      col("y").as("ya"), cellX.as("pcx"), cellY.as("pcy"))
      .withColumn("ox", explode(sequence(lit(-1), lit(1))))
      .withColumn("oy", explode(sequence(lit(-1), lit(1))))
      .select(col("id_a"), col("xa"), col("ya"),
        (col("pcx") + col("ox")).as("cx"), (col("pcy") + col("oy")).as("cy"))
    probe.join(build, Seq("cx", "cy"))
      .filter(col("id_a") =!= col("id_b") &&
        abs(col("xa") - col("xb")) <= d && abs(col("ya") - col("yb")) <= d)
      .select(col("id_a"),
        greatest(abs(col("xa") - col("xb")), abs(col("ya") - col("yb"))).as("dist"),
        col("id_b"))
      .groupBy(col("id_a").as("id"))
      .agg(min(struct(col("dist"), col("id_b"))).as("_nn"))
      .select(col("id"), col("_nn.id_b").as("nn_id"), col("_nn.dist").as("nn_dist"))
      .orderBy("id")
  }
}
