package graft.algo

import org.apache.spark.sql.DataFrame

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.engine.Iterate
import graft.graph.GraphOps

/** Synchronous label propagation with deterministic tie-breaking — fixed
  * iteration count, exact reproducible labels (north rule).
  *
  * Per iteration each vertex adopts the label with the greatest total
  * incident edge weight among its (undirected) neighbours; ties break to
  * the smallest label. Weights are integer-valued co-occurrence counts,
  * so the argmax is exact (no float-ordering nondeterminism).
  */
object LabelProp {

  /** Explain-only replica of one LPA step (r06 plan audit). */
  def stepPlanForExplain(edges: DataFrame): DataFrame = {
    val und = GraphOps.undirect(edges)
      .select(col("src"), col("dst"), col("weight").cast("long").as("w"))
    val state = GraphOps.vertices(edges).select(col("v"), col("v").as("label"))
    val byLabel = und
      .join(state.select(col("v").as("src"), col("label")), Seq("src"))
      .groupBy(col("dst").as("v"), col("label"))
      .agg(sum("w").as("wt"))
    byLabel
      .groupBy(col("v"))
      .agg(max_by(col("label"), struct(col("wt"), -col("label"))).as("label"))
  }

  /** @return (v LONG, label LONG) after exactly `iters` iterations. */
  def run(
      edges: DataFrame,
      iters: Int = 3,
      store: Option[Iterate.CheckpointStore] = None,
      runName: String = "lpa"): DataFrame = {
    // persisted lazily (r6): the first iteration's single reference
    // materializes the cache inside its own job — a separate count()
    // barrier bought nothing (hash repartition samples nothing, and the
    // step plan scans `und` exactly once, so no duplicate compute risk)
    val und = GraphOps.undirect(edges)
      .select(col("src"), col("dst"), col("weight").cast("long").as("w"))
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val state0 = GraphOps.vertices(edges).select(col("v"), col("v").as("label"))

    def step(state: DataFrame, iter: Int): DataFrame = {
      val byLabel = und
        .join(state.select(col("v").as("src"), col("label")), Seq("src"))
        .groupBy(col("dst").as("v"), col("label"))
        .agg(sum("w").as("wt"))
      // r6: the argmax by (wt desc, label asc) as a max_by aggregation
      // instead of a row_number window — drops the per-partition sort and
      // partial-aggregates map-side (guide §2.3 "aggregate before you
      // shuffle"). The ordering struct (wt, -label) has no ties (one row
      // per (v, label)), labels are non-negative vids so -label is safe,
      // and integer weights make the argmax exact — identical labels.
      byLabel
        .groupBy(col("v"))
        .agg(max_by(col("label"), struct(col("wt"), -col("label"))).as("label"))
    }

    val out = graft.engine.Conf.withIterTuning(edges.sparkSession) {
      Iterate.run(runName, state0, step, (_, _, _) => false,
        iters, Some(iters), store)
    }
    und.unpersist()
    out
  }
}
