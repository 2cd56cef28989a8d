package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Triangle counting over the undirected simple graph induced by the edge
  * table: orient every edge low→high id, deduplicate, enumerate wedges by
  * a self-join, close them with a second join (a semi-join against the
  * oriented edge set). Exact count (north rule).
  *
  * The low→high orientation means each triangle {a<b<c} is produced
  * exactly once (as wedge a→b→c closed by a→c), and bounds the join
  * fan-out by out-degree in the orientation — the standard trick that
  * keeps the wedge join tractable on skewed graphs (hubs become high-id
  * sinks for most of their edges). AQE handles residual skew.
  */
object Triangles {

  /** Oriented deduplicated edges: (a, b) with a < b. */
  def oriented(edges: DataFrame): DataFrame =
    edges
      .select(least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()

  /** Explain-only replica of the pre-checkpoint count plan (r06 plan
    * audit — [[count]] itself materializes eagerly, so its returned plan
    * is just the checkpoint scan). */
  def planForExplain(edges: DataFrame): DataFrame = {
    val e = oriented(edges)
    val wedges = e.as("e1")
      .join(e.as("e2"), col("e1.b") === col("e2.a"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    wedges
      .join(e.as("e3"), col("x") === col("e3.a") && col("z") === col("e3.b"), "left_semi")
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("triangles"))
  }

  /** Global triangle count: 1 row, 1 column `triangles`. The result is
    * materialized eagerly (it is one row / |V| rows) so the oriented edge
    * cache can be released before returning — r2 leaked one persisted
    * edge set per call. */
  def count(edges: DataFrame): DataFrame = {
    val e = oriented(edges).persist(StorageLevel.MEMORY_AND_DISK)
    val wedges = e.as("e1")
      .join(e.as("e2"), col("e1.b") === col("e2.a"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    val tri = wedges
      .join(e.as("e3"), col("x") === col("e3.a") && col("z") === col("e3.b"), "left_semi")
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("triangles"))
      .localCheckpoint(true)
    e.unpersist(false)
    tri
  }

  /** Per-vertex triangle participation counts: (v, triangles). */
  def perVertex(edges: DataFrame): DataFrame = {
    val e = oriented(edges).persist(StorageLevel.MEMORY_AND_DISK)
    val tris = e.as("e1")
      .join(e.as("e2"), col("e1.b") === col("e2.a"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
      .join(e.as("e3"), col("x") === col("e3.a") && col("z") === col("e3.b"), "left_semi")
    val out = tris.select(explode(array(col("x"), col("y"), col("z"))).as("v"))
      .groupBy("v")
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("triangles"))
      .localCheckpoint(true)
    e.unpersist(false)
    out
  }
}
