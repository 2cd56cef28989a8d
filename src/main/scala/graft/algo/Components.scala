package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.engine.Iterate
import graft.graph.GraphOps

/** Connected components by small-label propagation with pointer jumping —
  * each vertex converges to the minimum vertex id of its (undirected)
  * component. Exact ids (north rule: "component/label IDs ... exact").
  *
  * Per iteration: comp'(v) = min( comp(v),
  *                                min_{u ∈ N(v)} comp(u),     — propagation
  *                                comp(comp(v)) )             — pointer jump
  * The jump term contracts long chains in O(log n) iterations instead of
  * O(diameter) — essential for the transcript graph's tool chains, whose
  * diameter grows linearly with data size. Converges when no label
  * changes. Labels only decrease and are always ids of same-component
  * vertices, so the fixpoint is the component minimum.
  */
object Components {

  /** @return (v LONG, comp LONG) */
  def run(
      edges: DataFrame,
      maxIter: Int = 50,
      store: Option[Iterate.CheckpointStore] = None,
      runName: String = "cc"): DataFrame = {
    val und = GraphOps.undirect(edges).select("src", "dst")
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    und.count()

    val state0 = GraphOps.vertices(edges)
      .select(col("v"), col("v").as("comp"), lit(true).as("changed"))

    // `changed` is carried as a state column so convergence is a cheap
    // filter over the just-written checkpoint — one Spark job/iteration
    def step(state: DataFrame, iter: Int): DataFrame = {
      val nbrMin = und
        .join(state.select(col("v").as("src"), col("comp").as("srcComp")), Seq("src"))
        .groupBy(col("dst").as("v"))
        .agg(min("srcComp").as("nbrMin"))
      // double pointer jump: looking up comp(comp(v)) and then the comp of
      // THAT against the same snapshot quarters long chains per iteration
      // (labels of same-component vertices are always valid candidates)
      val lookup = state.select(col("v").as("comp"), col("comp").as("jumpComp"))
      val lookup2 = state.select(col("v").as("jumpComp"), col("comp").as("jumpComp2"))
      state
        .join(lookup, Seq("comp"), "left")
        .join(lookup2, Seq("jumpComp"), "left")
        .join(nbrMin, Seq("v"), "left")
        .select(col("v"), col("comp").as("prevComp"),
          least(col("comp"),
            coalesce(col("nbrMin"), col("comp")),
            coalesce(col("jumpComp"), col("comp")),
            coalesce(col("jumpComp2"), col("comp"))).as("comp"))
        .select(col("v"), col("comp"), (col("comp") =!= col("prevComp")).as("changed"))
    }

    def converged(prev: DataFrame, next: DataFrame, iter: Int): Boolean =
      next.filter(col("changed")).isEmpty

    val out = Iterate.run(runName, state0, step, converged, maxIter, None, store)
    und.unpersist()
    out.select(col("v"), col("comp"))
  }
}
