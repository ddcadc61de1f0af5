package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-12 batch 2: grid distance join, k-anonymity, top-k
  * aggregate, pointer-doubling forest resolution.
  */
class GeoForestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("chebyshevPairs matches brute force, including cross-cell pairs " +
      "on cell boundaries") {
    // points straddling cell boundaries for d=3: (0,0)-(3,3) distance
    // exactly d; (0,0)-(4,0) just outside; a co-located clump
    val pts = Seq((1L, 0L, 0L), (2L, 3L, 3L), (3L, 4L, 0L), (4L, 100L, 100L),
      (5L, 101L, 99L), (6L, 102L, 102L), (7L, 50L, 50L)).toDF("id", "x", "y")
    val got = GraphSpecHelp.pairSet(GeoOps.chebyshevPairs(pts, d = 3))
    val raw = Seq((1L, 0L, 0L), (2L, 3L, 3L), (3L, 4L, 0L), (4L, 100L, 100L),
      (5L, 101L, 99L), (6L, 102L, 102L), (7L, 50L, 50L))
    val want = (for {
      (i, xi, yi) <- raw; (j, xj, yj) <- raw
      if i < j && math.abs(xi - xj) <= 3 && math.abs(yi - yj) <= 3
    } yield (i, j)).toSet
    assert(got == want && want.contains((1L, 2L)) && !want.contains((1L, 3L)))
  }

  test("kAnonymize suppresses sub-k groups and pseudonymizes the id") {
    val df = ((1 to 12).map(i => (i.toLong, "A")) ++ Seq((100L, "B"), (101L, "B")))
      .toDF("id", "qi")
    val out = Relational.kAnonymize(df, "id", Seq(col("qi")), Seq("qi"), k = 10)
      .collect()
    assert(out.length == 12 && out.forall(_.getString(1) == "A"),
      "the 2-member B group must be suppressed")
    assert(out.forall(_.getLong(2) == 12L), "rows carry their group size")
    // pseudonym is a pure function of the id, never the raw id
    assert(out.map(_.getString(0)).distinct.length == 12)
    assert(!out.exists(r => (1 to 12).map(_.toString).contains(r.getString(0))))
  }

  test("topK aggregate equals the window form and ships bounded buffers") {
    val df = (1L to 1000L).map(i => (s"g${i % 3}", (i % 97).toDouble, i))
      .toDF("g", "v", "id").repartition(7)
    val got = df.groupBy("g")
      .agg(graft.functions.TopKAggregate.topK(4)(col("v"), col("id")).as("tk"))
      .select(col("g"), posexplode(arrays_zip(col("tk.vs"), col("tk.ids"))))
      .select(col("g"), col("pos"), col("col.vs"), col("col.ids"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    val w = org.apache.spark.sql.expressions.Window.partitionBy("g")
      .orderBy(col("v").desc, col("id"))
    val want = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 4)
      .select(col("g"), (col("rn") - 1).cast("int").as("pos"), col("v"), col("id"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(got == want)
  }

  test("forestRootDepth: two trees + explicit root rows resolve with exact depths") {
    // tree A: 1 <- 2 <- 3 <- 4 <- 5 (chain, depths 0..4)
    // tree B: 10 <- 11, 10 <- 12 (depths 0,1,1); 20 isolated root
    val nodes = Seq(
      (1L, None), (2L, Some(1L)), (3L, Some(2L)), (4L, Some(3L)), (5L, Some(4L)),
      (10L, None), (11L, Some(10L)), (12L, Some(10L)), (20L, None))
      .toDF("id", "parent")
    val got = GraphOps.forestRootDepth(nodes)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 1L, 0L), (2L, 1L, 1L), (3L, 1L, 2L), (4L, 1L, 3L),
      (5L, 1L, 4L), (10L, 10L, 0L), (11L, 10L, 1L), (12L, 10L, 1L),
      (20L, 20L, 0L)))
    // implicit root: a parent id with no own row still resolves
    val implicitRoot = Seq((2L, Some(1L)), (3L, Some(2L))).toDF("id", "parent")
    val got2 = GraphOps.forestRootDepth(implicitRoot)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got2 == Seq((1L, 1L, 0L), (2L, 1L, 1L), (3L, 1L, 2L)))
  }
}

private object GraphSpecHelp {
  def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
}
