package graft.walk

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.graph.GraphOps
import graft.synth.Synth

/** Distributed random-walk engine over the edge table — the Spark-native
  * re-expression of the reference's WalkEngine (include/walk.hpp; SURVEY.md
  * §2.3–2.5). Walk semantics follow the reference's P(e) = Pe·Ps·Pd
  * decomposition (README.md:392-434):
  *
  *  - Pe (extension / termination): truncation at `maxSteps` and/or a
  *    geometric continue-probability `keepProb` (reference T1,
  *    include/walk.hpp:956-973); zero-out-degree vertices terminate
  *    walkers (include/walk.hpp:956-961).
  *  - Ps (static): edge weight, materialized once per vertex as a Vose
  *    alias table for O(1) sampling (reference T2, include/walk.hpp:538-652).
  *  - Pd (dynamic, second order): node2vec's 1/p, 1, 1/q over the previous
  *    vertex's neighbourhood. Where the reference rejection-samples with
  *    remote state queries (T3/T6), the joins formulation computes the
  *    exact per-candidate distribution (frontier ⋈ adjacency(curV) ⋈
  *    neighbour-set(prevV)) and inverse-CDF samples once — same
  *    distribution, no retry loop (SURVEY.md §2.10).
  *
  * All randomness is xxhash64(seed, walkerId, step[, salt]) — identical
  * across retries, resumes, and parallelism levels (SURVEY.md §4.4).
  * Output is the footprint table (walkerId, step, vertex) — the reference's
  * Footprint design (include/path.hpp:37-44); [[paths]] assembles per-walker
  * sequences (reference assemble_path, include/path.hpp:164-477, which is
  * one groupBy + sort_array here).
  */
object Walk {

  /** Deterministic U[0,1) per (walker, step, salt). */
  private def rand(seed: Long, salt: String): Column =
    Synth.hashRand(lit(seed), col("walkerId"), col("step"), lit(salt))

  /** Portable twin of [[rand]]: first 60 bits of
    * md5("seed:walkerId:step:salt") / 2^60 — any engine with md5 can
    * replay the whole walk (the DuckDB oracles do, recursively). The
    * division is by a power of two, so the double is exact. */
  private def randP(seed: Long, salt: String): Column =
    graft.text.TextOps.h64(
      concat_ws(":", lit(seed), col("walkerId"), col("step"), lit(salt)))
      .cast("double") / lit(1152921504606846976.0) // 2^60

  private def randSel(portable: Boolean, seed: Long, salt: String): Column =
    if (portable) randP(seed, salt) else rand(seed, salt)

  /** Inverse-CDF draw over a vertex's out-edges (weights in neighbour
    * order): smallest j with prefix-sum(j+1) > r·total, capped at the last
    * index. O(deg) instead of the alias table's O(1), but exactly
    * replayable in SQL (edge weights are integer-valued, so every prefix
    * sum is exact in doubles — no float-order ambiguity across engines).
    * Used by the portable-RNG walk variants; the default path keeps the
    * codegen'd alias sampler. */
  private val inverseCdfSample =
    udf { (nbrs: Seq[Long], wts: Seq[Double], r: Double) =>
      val n = nbrs.size
      var total = 0.0
      var i = 0
      while (i < n) { total += wts(i); i += 1 }
      val dart = r * total
      var cum = 0.0
      var j = 0
      while (j < n - 1 && { cum += wts(j); cum <= dart }) j += 1
      nbrs(j)
    }

  /** O(1) alias-table draw over a vertex's out-edges. */
  private val aliasSample =
    udf { (nbrs: Seq[Long], prob: Seq[Double], alias: Seq[Int], r1: Double, r2: Double) =>
      val n = nbrs.size
      val i = math.min((r1 * n).toInt, n - 1)
      if (r2 < prob(i)) nbrs(i) else nbrs(alias(i))
    }

  /** Exact node2vec draw: weight × (back ? 1/p : common-neighbour ? 1 : 1/q),
    * inverse-CDF over the candidate list. `prevNbrs` is sorted (binary
    * search, cf. reference src/apps/node2vec.hpp:158-166). */
  private val node2vecSample =
    udf { (nbrs: Seq[Long], wts: Seq[Double], prevV: Long, prevNbrs: Seq[Long],
           p: Double, q: Double, r: Double) =>
      val n = nbrs.size
      var total = 0.0
      val cum = new Array[Double](n)
      var i = 0
      while (i < n) {
        val c = nbrs(i)
        val bias =
          if (c == prevV) 1.0 / p
          else if (prevNbrs != null &&
            java.util.Arrays.binarySearch(prevNbrs.toArray, c) >= 0) 1.0
          else 1.0 / q
        total += wts(i) * bias
        cum(i) = total
        i += 1
      }
      val dart = r * total
      var j = 0
      while (j < n - 1 && cum(j) <= dart) j += 1
      nbrs(j)
    }

  // ------------------------------------------------- generic transitions

  /** Pe — extension (continue) probability per step (reference
    * extension_comp, include/walk.hpp:204-215). */
  sealed trait Extension
  object Extension {
    /** Pe = 1: truncation at maxSteps only (DeepWalk). */
    case object Always extends Extension
    /** Constant continue probability (reference
      * src/examples/simple_walk.cpp:35-53; PPR's 1-α). */
    final case class Constant(p: Double) extends Extension
    /** Per-vertex Pe from a (v, pe) table — vertex-dependent termination
      * (reference vertex masks / per-vertex extension). */
    final case class PerVertex(pe: DataFrame) extends Extension
  }

  /** Ps — static per-edge factor (reference static_comp,
    * include/walk.hpp:217-231). */
  sealed trait StaticComp
  object StaticComp {
    /** Ps = edge weight (biased walk). */
    case object EdgeWeight extends StaticComp
    /** Ps = 1 (unbiased walk over the adjacency structure). */
    case object Unbiased extends StaticComp
  }

  /** The reference's first-order TransitionConfig lambda bundle
    * (include/walk.hpp:196-271) re-expressed for the exact-joins engine:
    * P(e) ∝ Ps(e) · Pd(state, e), continue with Pe(state). Where the
    * reference rejection-samples Pd under user-supplied upper bounds
    * (T4/T5), this engine computes the exact per-candidate distribution
    * and inverse-CDF samples once — no bounds, no retry loop, identical
    * distribution.
    *
    * @param dynamic Pd(step, curV, dst, edgeWeight) → bias ≥ 0, evaluated
    *                per candidate edge each step (reference
    *                src/examples/dynamic_walk.cpp:52-93)
    */
  final case class TransitionConfig(
      extension: Extension = Extension.Always,
      static: StaticComp = StaticComp.EdgeWeight,
      dynamic: Option[(Int, Long, Long, Double) => Double] = None)

  /** Second-order bundle (reference SecondOrderTransitionConfig,
    * include/walk.hpp:273-363): Pd additionally sees the previous vertex
    * and its sorted neighbour list (the engine answers the reference's
    * remote state queries T6 with a join).
    *
    * @param dynamic2 Pd(step, prevV, prevNbrsSorted, dst, edgeWeight) */
  final case class SecondOrderConfig(
      extension: Extension = Extension.Always,
      static: StaticComp = StaticComp.EdgeWeight,
      dynamic2: (Int, Long, Seq[Long], Long, Double) => Double)

  /** Exact inverse-CDF draw over user-biased candidate weights. */
  private def dynSampleUdf(f: (Int, Long, Long, Double) => Double) =
    udf { (step: Int, curV: Long, nbrs: Seq[Long], wts: Seq[Double],
           statics: Seq[Double], r: Double) =>
      val n = nbrs.size
      val bw = new Array[Double](n)
      var total = 0.0
      var i = 0
      while (i < n) {
        bw(i) = statics(i) * f(step, curV, nbrs(i), wts(i))
        total += bw(i)
        i += 1
      }
      if (total <= 0.0) None
      else {
        val dart = r * total
        var cum = 0.0
        var j = 0
        while (j < n - 1 && { cum += bw(j); cum <= dart }) j += 1
        Some(nbrs(j))
      }
    }

  private def dyn2SampleUdf(f: (Int, Long, Seq[Long], Long, Double) => Double) =
    udf { (step: Int, prevV: Long, prevNbrs: Seq[Long], nbrs: Seq[Long],
           wts: Seq[Double], statics: Seq[Double], r: Double) =>
      val n = nbrs.size
      val bw = new Array[Double](n)
      var total = 0.0
      var i = 0
      while (i < n) {
        bw(i) = statics(i) * f(step, prevV, prevNbrs, nbrs(i), wts(i))
        total += bw(i)
        i += 1
      }
      if (total <= 0.0) None
      else {
        val dart = r * total
        var cum = 0.0
        var j = 0
        while (j < n - 1 && { cum += bw(j); cum <= dart }) j += 1
        Some(nbrs(j))
      }
    }

  /** Per-step survival filter for an [[Extension]]; `peCol` is resolved
    * against the frontier (PerVertex joins its table on curV). */
  private def applyExtension(
      frontier: DataFrame, ext: Extension, seed: Long, portable: Boolean): DataFrame =
    ext match {
      case Extension.Always => frontier
      case Extension.Constant(p) =>
        frontier.filter(randSel(portable, seed, "keep") < p)
      case Extension.PerVertex(pe) =>
        frontier
          .join(broadcast(pe.select(col("v").as("curV"), col("pe"))), Seq("curV"), "left")
          .filter(randSel(portable, seed, "keep") < coalesce(col("pe"), lit(1.0)))
          .drop("pe")
    }

  /** First-order walk under a user [[TransitionConfig]] — the reference's
    * walk() entry point for arbitrary Pe/Ps/Pd. Same footprint output and
    * RNG keying as [[firstOrder]]; with the default config this IS
    * firstOrder (same salts, same alias fast path). */
  def generic(
      edges: DataFrame,
      starts: DataFrame,
      maxSteps: Int,
      config: TransitionConfig = TransitionConfig(),
      seed: Long = 42L,
      portableRng: Boolean = false): DataFrame = {
    config match {
      // trivial bundle → the tuned default path
      case TransitionConfig(Extension.Always, StaticComp.EdgeWeight, None) =>
        firstOrder(edges, starts, maxSteps, 1.0, seed, None, "walk", portableRng)
      case TransitionConfig(Extension.Constant(p), StaticComp.EdgeWeight, None) =>
        firstOrder(edges, starts, maxSteps, p, seed, None, "walk", portableRng)
      case _ =>
        val adj = GraphOps.adjacency(edges).toDF()
          .withColumn("statics", config.static match {
            case StaticComp.EdgeWeight => col("wts")
            case StaticComp.Unbiased => transform(col("wts"), _ => lit(1.0))
          })
          .repartition(col("v"))
          .persist(StorageLevel.MEMORY_AND_DISK)

        val sampler: Column = config.dynamic match {
          case Some(f) =>
            dynSampleUdf(f)(col("step"), col("curV"), col("nbrs"), col("wts"),
              col("statics"), randSel(portableRng, seed, "pd"))
          case None =>
            inverseCdfSample(col("nbrs"), col("statics"), randSel(portableRng, seed, "s"))
        }

        var frontier = starts.select(col("walkerId"), lit(0).as("step"), col("curV"))
          .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
        val history = scala.collection.mutable.ArrayBuffer[DataFrame](frontier)
        var step = 0
        var active = frontier.count()
        while (active > 0 && step < maxSteps) {
          val alive = applyExtension(frontier, config.extension, seed, portableRng)
          val side = if (active < LightModeThreshold) broadcast(alive) else alive
          frontier = side.join(adj, side("curV") === adj("v"))
            .select(col("walkerId"), (col("step") + 1).as("step"), sampler.as("curV"))
            .filter(col("curV").isNotNull)
            .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
          history += frontier
          step += 1
          active = frontier.count()
          System.err.println(s"[graft:gwalk] step=$step active=$active")
        }
        adj.unpersist(false)
        history.map(f => f.select(col("walkerId"), col("step"), col("curV").as("vertex")))
          .reduce(_ unionAll _)
    }
  }

  /** Second-order walk under a user [[SecondOrderConfig]]. With the
    * node2vec bias as `dynamic2` this reproduces [[node2vec]] draw-for-
    * draw (same salts) — see WalkApiSpec. */
  def generic2(
      edges: DataFrame,
      starts: DataFrame,
      maxSteps: Int,
      config: SecondOrderConfig,
      seed: Long = 42L,
      portableRng: Boolean = false): DataFrame = {
    val adj = GraphOps.adjacency(edges).toDF()
      .withColumn("statics", config.static match {
        case StaticComp.EdgeWeight => col("wts")
        case StaticComp.Unbiased => transform(col("wts"), _ => lit(1.0))
      })
      .repartition(col("v"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nbrSets = adj.select(col("v").as("pv"), col("nbrs").as("prevNbrs"))

    val firstStep =
      if (portableRng) inverseCdfSample(col("nbrs"), col("statics"), randP(seed, "s"))
      else graft.functions.AliasSampleExpr.sample(col("nbrs"), col("prob"), col("alias"),
        rand(seed, "a1"), rand(seed, "a2"))
    val dyn = dyn2SampleUdf(config.dynamic2)

    var frontier = starts.select(
        col("walkerId"), lit(0).as("step"), col("curV"), lit(null).cast("long").as("prevV"))
      .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
    val history = scala.collection.mutable.ArrayBuffer[DataFrame](frontier)
    var step = 0
    var active = frontier.count()
    while (active > 0 && step < maxSteps) {
      val alive = applyExtension(frontier, config.extension, seed, portableRng)
      val withAdj = alive.join(adj, alive("curV") === adj("v"))
      val withPrev = withAdj.join(nbrSets, withAdj("prevV") === nbrSets("pv"), "left")
      frontier = withPrev.select(
          col("walkerId"),
          (col("step") + 1).as("step"),
          when(col("prevV").isNull, firstStep)
            .otherwise(dyn(col("step"), col("prevV"), col("prevNbrs"), col("nbrs"),
              col("wts"), col("statics"), randSel(portableRng, seed, "n2v"))).as("curV"),
          col("curV").as("prevV"))
        .filter(col("curV").isNotNull)
        .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
      history += frontier
      step += 1
      active = frontier.count()
      System.err.println(s"[graft:gwalk2] step=$step active=$active")
    }
    adj.unpersist(false)
    history.map(_.select(col("walkerId"), col("step"), col("curV").as("vertex")))
      .reduce(_ unionAll _)
  }

  /** Walker start vertices: walker i starts at the vertex of dense rank
    * (i mod |V|) — the reference's default equal distribution
    * (include/walk.hpp:403-411). */
  def equalStarts(edges: DataFrame, numWalkers: Long): DataFrame = {
    val spark = edges.sparkSession
    val verts = GraphOps.vertices(edges)
    val indexed = graft.derive.Derive.withDenseVid(
      verts.withColumnRenamed("v", "conv_id").withColumn("turn_idx", lit(0)))
      .select(col("conv_id").as("v"), col("vid").as("idx"))
    val nV = indexed.count()
    spark.range(numWalkers).select(col("id").as("walkerId"), pmod(col("id"), lit(nV)).as("idx"))
      .join(indexed, "idx")
      .select(col("walkerId"), col("v").as("curV"))
  }

  /** Uniform random starts: vertex of dense rank h64(walker) mod |V|
    * (reference include/walk.hpp:413-421, made deterministic; md5-based
    * so the DuckDB walk oracles replay the start assignment too). */
  def uniformStarts(edges: DataFrame, numWalkers: Long, seed: Long): DataFrame = {
    val spark = edges.sparkSession
    val verts = GraphOps.vertices(edges)
    val indexed = graft.derive.Derive.withDenseVid(
      verts.withColumnRenamed("v", "conv_id").withColumn("turn_idx", lit(0)))
      .select(col("conv_id").as("v"), col("vid").as("idx"))
    val nV = indexed.count()
    spark.range(numWalkers)
      .select(col("id").as("walkerId"),
        pmod(graft.text.TextOps.h64(concat_ws(":", lit(seed), col("id"), lit("start"))),
          lit(nV)).as("idx"))
      .join(indexed, "idx")
      .select(col("walkerId"), col("v").as("curV"))
  }

  /** Frontier size below which the walk switches to "light mode": the
    * tiny frontier is broadcast, so the per-step join needs NO exchange
    * at all (the reference's analogous tail optimization drops to 3
    * comm threads when active < 4000, include/walk.hpp:934). */
  val LightModeThreshold = 4096L

  /** Frontier size below which the chained kernels semi-join the CSR
    * side down to the buckets that still hold walkers (exactly the rows
    * the kernel can read) instead of re-shuffling the whole adjacency.
    * Only worth its two extra small jobs per round when the CSR is big
    * ([[BucketPruneMinAdj]]) — on toy graphs the full shuffle is cheaper
    * than the pruning plan. */
  val BucketPruneThreshold = 100000L
  val BucketPruneMinAdj = 1000000L

  /** First-order walk (DeepWalk `keepProb=1`, PPR `maxSteps` large &
    * `keepProb=1-α`). Returns footprints (walkerId, step, vertex) with
    * step 0 = start vertex.
    *
    * Per iteration: one co-partitioned hash join frontier⋈adjacency + the
    * sampling projection. Walkers at vertices with no out-edges terminate
    * (inner join drops them). Tail steps (active < [[LightModeThreshold]])
    * broadcast the frontier — zero shuffle per step.
    *
    * Memory: each step's frontier is checkpointed with serialized,
    * spillable storage (MEMORY_AND_DISK_SER) — the footprint history is
    * L materialized frontiers, and deserialized row-object storage caused
    * full-GC storms at 30M+ edges × L=80.
    *
    * Durability (reference per-epoch path flush, include/walk.hpp:703-844):
    * pass a `store` to make every step a durable, lineage-tracked Parquet
    * checkpoint under `runName`; a re-run with the same store RESUMES from
    * the last complete step — randomness is keyed on (seed, walkerId,
    * step), so a resumed walk is bitwise-identical to an uninterrupted one
    * (WalkResumeSpec).
    */
  def firstOrder(
      edges: DataFrame,
      starts: DataFrame,              // (walkerId, curV)
      maxSteps: Int,
      keepProb: Double = 1.0,
      seed: Long = 42L,
      store: Option[graft.engine.Iterate.CheckpointStore] = None,
      runName: String = "walk",
      portableRng: Boolean = false): DataFrame = {
    val spark = edges.sparkSession
    val adj = GraphOps.adjacency(edges).toDF()
      .repartition(col("v"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    def asFp(f: DataFrame) =
      f.select(col("walkerId"), col("step"), col("curV").as("vertex"))

    def truncate(df: DataFrame, step: Int): DataFrame = store match {
      case Some(s) => s.save(runName, step, df)
      case None => df.localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
    }

    // resume: rebuild the footprint history from the store's complete
    // steps and continue from the highest one
    val resumed: Seq[(Int, DataFrame)] = store match {
      case Some(s) => s.latest(runName) match {
        case Some((hi, _)) => (0 to hi).map(i => (i, spark.read.parquet(s.iterPath(runName, i))))
        case None => Seq.empty
      }
      case None => Seq.empty
    }

    val history = scala.collection.mutable.ArrayBuffer[DataFrame]()
    var step = 0
    var frontier: DataFrame = null
    if (resumed.nonEmpty) {
      resumed.foreach { case (i, df) => history += df; step = i; frontier = df }
      System.err.println(s"[graft:$runName] resumed at step=$step")
    } else {
      frontier = truncate(starts.select(col("walkerId"), lit(0).as("step"), col("curV")), 0)
      history += frontier
    }

    var active = frontier.count()
    while (active > 0 && step < maxSteps) {
      val alive =
        if (keepProb >= 1.0) frontier
        else frontier.filter(randSel(portableRng, seed, "keep") < keepProb)
      // light mode: a broadcast frontier joins the persisted adjacency
      // in place — no exchange on either side for the tail steps
      val frontierSide = if (active < LightModeThreshold) broadcast(alive) else alive
      val sampled =
        if (portableRng)
          inverseCdfSample(col("nbrs"), col("wts"), randP(seed, "s"))
        else
          graft.functions.AliasSampleExpr.sample(col("nbrs"), col("prob"), col("alias"),
            rand(seed, "a1"), rand(seed, "a2"))
      val advanced = frontierSide
        .join(adj, frontierSide("curV") === adj("v"))
        .select(col("walkerId"), (col("step") + 1).as("step"), sampled.as("curV"))
      // plan truncation per step is safe with carried stats: the frontier
      // plan never self-joins, so stats grow linearly, not exponentially
      // (cf. Iterate)
      frontier = truncate(advanced, step + 1)
      history += frontier
      step += 1
      active = frontier.count()
      System.err.println(s"[graft:$runName] step=$step active=$active")
    }
    adj.unpersist(false)
    // footprints = union of the already-materialized per-step frontiers;
    // in durable mode these are the store's Parquet read-backs
    history.map(asFp).reduce(_ unionAll _)
  }

  /** Durable footprint sink (the at-scale path: one Parquet write of the
    * whole footprint table after the walk). */
  def sinkFootprints(footprints: DataFrame, path: String): DataFrame = {
    footprints.write.mode("overwrite").parquet(path)
    footprints.sparkSession.read.parquet(path)
  }

  /** splitmix64 → U[0,1), keyed on (seed, walker, step) — the JVM-side
    * twin of [[rand]] for the chained fast path (deterministic, partition-
    * independent; not bit-identical to the column xxhash64 variant). */
  private[walk] def jvmRand(seed: Long, walkerId: Long, step: Long, salt: Long): Double = {
    var z = seed ^ (walkerId * 0x9E3779B97F4A7C15L) ^ (step * 0xC2B2AE3D27D4EB4FL) ^
      (salt * 0x165667B19E3779F9L)
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    (z >>> 11).toDouble / 9007199254740992.0
  }

  /** First-order walk with LOCAL CHAINING — the reference's key
    * throughput lever (include/walk.hpp:1056-1063; SURVEY.md §4.2): the
    * adjacency is split into contiguous vertex-id ranges; a cogroup
    * brings each range's walkers and CSR rows into one task, where each
    * walker advances *many* steps in-memory until it leaves the range,
    * dies, or hits maxSteps. Only range-crossers re-shuffle. On
    * transcript graphs (conversation chains = consecutive vids) most of a
    * walk completes inside one range, collapsing ~maxSteps shuffles into
    * ~1-2.
    *
    * Same termination semantics as [[firstOrder]]; randomness is
    * deterministic splitmix64 on (seed, walker, step) — distributionally
    * identical but not bit-identical to the join-based variant.
    *
    * @param buckets number of vertex ranges; size so one range's CSR fits
    *                a task's memory (at 100 TB: thousands of buckets)
    */
  def firstOrderChained(
      edges: DataFrame,
      starts: DataFrame,
      maxSteps: Int,
      keepProb: Double = 1.0,
      seed: Long = 42L,
      buckets: Int = 0): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val nBuckets =
      if (buckets > 0) buckets else math.max(spark.sparkContext.defaultParallelism * 2, 4)

    val maxV = edges.agg(greatest(max("src"), max("dst"))).head().getLong(0)
    val rangeSize = math.max(1L, maxV / nBuckets + 1)

    // persist the bucketed CSR once — the cogroup re-reads it every outer
    // round, and without the persist each round re-runs the groupBy +
    // alias-table build (the count also materializes it and gates tail
    // bucket pruning)
    val adjDf = GraphOps.adjacency(edges)
      .map(a => (a.v / rangeSize, a))
      .toDF("bucket", "adj")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val adjCount = adjDf.count()
    val adjB = adjDf.as[(Long, graft.model.AdjRow)].groupByKey(_._1)

    var frontier = starts.select(col("walkerId"), lit(0).as("step"), col("curV"))
      .as[(Long, Int, Long)].localCheckpoint(true)
    val history = scala.collection.mutable.ArrayBuffer[DataFrame](
      frontier.toDF("walkerId", "step", "curV")
        .select(col("walkerId"), col("step"), col("curV").as("vertex")))

    var outer = 0
    var active = frontier.count()
    while (active > 0 && outer <= maxSteps) {
      val grouped = frontier.groupByKey(_._3 / rangeSize)
      // tail rounds: the kernel only ever reads CSR rows of the buckets
      // its walkers are currently in, so once the frontier is small the
      // CSR side is semi-joined down to those buckets instead of
      // re-shuffling the whole adjacency for a handful of walkers (the
      // round-2+ tail used to cost as much as round 1)
      val adjRound =
        if (active < BucketPruneThreshold && adjCount >= BucketPruneMinAdj) {
          val bks = frontier.toDF("walkerId", "step", "curV")
            .select(floor(col("curV") / lit(rangeSize)).cast("long").as("bucket"))
            .distinct()
          adjDf.join(broadcast(bks), "bucket")
            .as[(Long, graft.model.AdjRow)].groupByKey(_._1)
        } else adjB
      // output rows: (walkerId, step, vertex, moved) — moved=false rows
      // are footprints of chained steps; moved=true rows are walkers
      // parked at a vertex OUTSIDE this bucket (next frontier)
      val out = grouped.cogroup(adjRound) { (bucket, ws, adjIt) =>
        val csr = new scala.collection.mutable.HashMap[Long, graft.model.AdjRow]
        adjIt.foreach { case (_, a) => csr.update(a.v, a) }
        ws.flatMap { case (walkerId, step0, v0) =>
          val outRows = scala.collection.mutable.ArrayBuffer[(Long, Int, Long, Boolean)]()
          var step = step0
          var cur = v0
          var done = false
          while (!done && step < maxSteps && cur / rangeSize == bucket) {
            csr.get(cur) match {
              case None => done = true // dangling: terminate
              case Some(a) =>
                if (keepProb < 1.0 && jvmRand(seed, walkerId, step, 1) >= keepProb) {
                  done = true
                } else {
                  val n = a.nbrs.length
                  val i = math.min((jvmRand(seed, walkerId, step, 2) * n).toInt, n - 1)
                  val nxt = if (jvmRand(seed, walkerId, step, 3) < a.prob(i)) a.nbrs(i)
                    else a.nbrs(a.alias(i))
                  step += 1
                  cur = nxt
                  outRows += ((walkerId, step, cur, false)) // footprint
                }
            }
          }
          if (!done && step < maxSteps && cur / rangeSize != bucket)
            outRows += ((walkerId, step, cur, true)) // crossed: re-shuffle
          outRows
        }
      }.toDF("walkerId", "step", "vertex", "moved")
        .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)

      history += out.filter(!col("moved"))
        .select(col("walkerId"), col("step"), col("vertex"))
      frontier = out.filter(col("moved"))
        .select(col("walkerId"), col("step"), col("vertex").as("curV"))
        .as[(Long, Int, Long)].localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
      outer += 1
      active = frontier.count()
      System.err.println(s"[graft:chain] outer=$outer active=$active")
    }
    adjDf.unpersist(false)
    history.reduce(_ unionAll _)
  }

  /** Second-order node2vec walk with LOCAL CHAINING — the reference's
    * biggest node2vec lever (include/walk.hpp:1226-1257; paper Table 5a):
    * same bucketed cogroup kernel as [[firstOrderChained]], with the
    * second-order state handled locally. Inside a bucket both curV's
    * adjacency AND prevV's neighbour set are in the task's CSR map, so a
    * walker chains many exact biased steps with zero communication; only
    * bucket-crossers re-shuffle, carrying their `prevNbrs` array (the
    * reference ships the same state in its walker messages — here it
    * rides ONLY on crossing rows instead of every per-step join row).
    * Randomness: deterministic splitmix64 on (seed, walker, step) —
    * distributionally identical to [[node2vec]], not bit-identical.
    */
  def node2vecChained(
      edges: DataFrame,
      starts: DataFrame,
      maxSteps: Int,
      p: Double = 1.0,
      q: Double = 1.0,
      seed: Long = 42L,
      buckets: Int = 0): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val nBuckets =
      if (buckets > 0) buckets else math.max(spark.sparkContext.defaultParallelism * 2, 4)
    val maxV = edges.agg(greatest(max("src"), max("dst"))).head().getLong(0)
    val rangeSize = math.max(1L, maxV / nBuckets + 1)

    // persist the bucketed CSR once (see firstOrderChained)
    val adjDf = GraphOps.adjacency(edges)
      .map(a => (a.v / rangeSize, a))
      .toDF("bucket", "adj")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val adjCount = adjDf.count()
    val adjB = adjDf.as[(Long, graft.model.AdjRow)].groupByKey(_._1)

    // frontier: (walkerId, step, curV, prevV (-1 = first step), prevNbrs)
    var frontier = starts.select(col("walkerId"), lit(0).as("step"), col("curV"),
        lit(-1L).as("prevV"), lit(Array.empty[Long]).as("prevNbrs"))
      .as[(Long, Int, Long, Long, Array[Long])]
      .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
    val history = scala.collection.mutable.ArrayBuffer[DataFrame](
      frontier.toDF("walkerId", "step", "curV", "prevV", "prevNbrs")
        .select(col("walkerId"), col("step"), col("curV").as("vertex")))

    var outer = 0
    var active = frontier.count()
    while (active > 0 && outer <= maxSteps) {
      val grouped = frontier.groupByKey(_._3 / rangeSize)
      // tail bucket pruning — see firstOrderChained
      val adjRound =
        if (active < BucketPruneThreshold && adjCount >= BucketPruneMinAdj) {
          val bks = frontier.toDF("walkerId", "step", "curV", "prevV", "prevNbrs")
            .select(floor(col("curV") / lit(rangeSize)).cast("long").as("bucket"))
            .distinct()
          adjDf.join(broadcast(bks), "bucket")
            .as[(Long, graft.model.AdjRow)].groupByKey(_._1)
        } else adjB
      val out = grouped.cogroup(adjRound) { (bucket, ws, adjIt) =>
        val csr = new scala.collection.mutable.HashMap[Long, graft.model.AdjRow]
        adjIt.foreach { case (_, a) => csr.update(a.v, a) }
        ws.flatMap { case (walkerId, step0, v0, pv0, pn0) =>
          val rows =
            scala.collection.mutable.ArrayBuffer[(Long, Int, Long, Long, Array[Long], Boolean)]()
          var step = step0
          var cur = v0
          var prev = pv0
          var prevNbrs = pn0
          var done = false
          while (!done && step < maxSteps && cur / rangeSize == bucket) {
            csr.get(cur) match {
              case None => done = true // dangling: terminate
              case Some(a) =>
                val nxt =
                  if (prev < 0) { // first step: static alias draw
                    val n = a.nbrs.length
                    val i = math.min((jvmRand(seed, walkerId, step, 2) * n).toInt, n - 1)
                    if (jvmRand(seed, walkerId, step, 3) < a.prob(i)) a.nbrs(i)
                    else a.nbrs(a.alias(i))
                  } else { // exact biased inverse-CDF (same math as node2vecSample)
                    val n = a.nbrs.length
                    val bw = new Array[Double](n)
                    var total = 0.0
                    var i = 0
                    while (i < n) {
                      val c = a.nbrs(i)
                      val bias =
                        if (c == prev) 1.0 / p
                        else if (java.util.Arrays.binarySearch(prevNbrs, c) >= 0) 1.0
                        else 1.0 / q
                      bw(i) = a.wts(i) * bias
                      total += bw(i)
                      i += 1
                    }
                    val dart = jvmRand(seed, walkerId, step, 4) * total
                    var cum = 0.0
                    var j = 0
                    while (j < n - 1 && { cum += bw(j); cum <= dart }) j += 1
                    a.nbrs(j)
                  }
                prev = cur
                prevNbrs = a.nbrs
                step += 1
                cur = nxt
                // footprints carry no arrays — only crossers ship prevNbrs
                rows += ((walkerId, step, cur, -1L, Array.empty[Long], false))
            }
          }
          if (!done && step < maxSteps && cur / rangeSize != bucket)
            rows += ((walkerId, step, cur, prev, prevNbrs, true))
          rows
        }
      }.toDF("walkerId", "step", "vertex", "prevV", "prevNbrs", "moved")
        .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)

      history += out.filter(!col("moved"))
        .select(col("walkerId"), col("step"), col("vertex"))
      frontier = out.filter(col("moved"))
        .select(col("walkerId"), col("step"), col("vertex").as("curV"),
          col("prevV"), col("prevNbrs"))
        .as[(Long, Int, Long, Long, Array[Long])]
        .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
      outer += 1
      active = frontier.count()
      System.err.println(s"[graft:n2vchain] outer=$outer active=$active")
    }
    adjDf.unpersist(false)
    history.reduce(_ unionAll _)
  }

  /** Second-order node2vec walk (exact distribution via joins; SURVEY.md
    * §2.10). First step is first-order; later steps bias by 1/p (return),
    * 1 (common neighbour), 1/q (explore). */
  def node2vec(
      edges: DataFrame,
      starts: DataFrame,
      maxSteps: Int,
      p: Double = 1.0,
      q: Double = 1.0,
      seed: Long = 42L,
      portableRng: Boolean = false,
      store: Option[graft.engine.Iterate.CheckpointStore] = None,
      runName: String = "n2v"): DataFrame = {
    val spark = edges.sparkSession
    val adj = GraphOps.adjacency(edges).toDF()
      .repartition(col("v"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nbrSets = adj.select(col("v").as("pv"), col("nbrs").as("prevNbrs"))

    def truncate(df: DataFrame, step: Int): DataFrame = store match {
      case Some(s) => s.save(runName, step, df)
      case None => df.localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
    }
    // mid-walk resume: the per-step frontier snapshots carry prevV, so a
    // re-run with the same store continues the second-order walk exactly
    // (randomness keys on (seed, walkerId, step) only)
    val resumed: Seq[(Int, DataFrame)] = store match {
      case Some(s) => s.latest(runName) match {
        case Some((hi, _)) =>
          (0 to hi).map(i => (i, spark.read.parquet(s.iterPath(runName, i))))
        case None => Seq.empty
      }
      case None => Seq.empty
    }

    val history = scala.collection.mutable.ArrayBuffer[DataFrame]()
    var step = 0
    var frontier: DataFrame = null
    if (resumed.nonEmpty) {
      resumed.foreach { case (i, df) => history += df; step = i; frontier = df }
      System.err.println(s"[graft:$runName] resumed at step=$step")
    } else {
      frontier = truncate(starts.select(
        col("walkerId"), lit(0).as("step"), col("curV"),
        lit(null).cast("long").as("prevV")), 0)
      history += frontier
    }

    var active = frontier.count()
    while (active > 0 && step < maxSteps) {
      val withAdj = frontier.join(adj, frontier("curV") === adj("v"))
      val withPrev = withAdj
        .join(nbrSets, withAdj("prevV") === nbrSets("pv"), "left")
      val firstStep =
        if (portableRng) inverseCdfSample(col("nbrs"), col("wts"), randP(seed, "s"))
        else graft.functions.AliasSampleExpr.sample(col("nbrs"), col("prob"), col("alias"),
          rand(seed, "a1"), rand(seed, "a2"))
      val advanced = withPrev.select(
        col("walkerId"),
        (col("step") + 1).as("step"),
        when(col("prevV").isNull, firstStep)
          .otherwise(
            node2vecSample(col("nbrs"), col("wts"), col("prevV"), col("prevNbrs"),
              lit(p), lit(q), randSel(portableRng, seed, "n2v"))).as("curV"),
        col("curV").as("prevV"))
      frontier = truncate(advanced, step + 1)
      history += frontier
      step += 1
      active = frontier.count()
      System.err.println(s"[graft:$runName] step=$step active=$active")
    }
    adj.unpersist(false)
    history.map(_.select(col("walkerId"), col("step"), col("curV").as("vertex")))
      .reduce(_ unionAll _)
  }

  /** Heterogeneous-edge metapath walk (reference src/apps/metapath.hpp:
    * 70-128 + metascheme.hpp): edges carry an `etype` column; walker w
    * follows scheme (w mod schemes.size), and at step s may only take
    * edges whose type is allowed by schemes(scheme)(s mod len); a vertex
    * with no allowed out-edge terminates the walker (reference Pe vertex
    * masks, metapath.hpp:102-105). Choice among allowed edges ∝ weight. */
  def metapath(
      edges: DataFrame,               // (src, dst, weight, etype)
      starts: DataFrame,              // (walkerId, curV)
      schemes: Seq[Seq[Seq[Boolean]]],
      maxSteps: Int,
      seed: Long = 42L,
      portableRng: Boolean = false): DataFrame = {
    val spark = edges.sparkSession
    val adj = edges
      .groupBy(col("src").as("v"))
      .agg(sort_array(collect_list(struct(col("dst"), col("weight"), col("etype")))).as("adjl"))
      .select(col("v"),
        col("adjl.dst").as("nbrs"), col("adjl.weight").as("wts"), col("adjl.etype").as("etypes"))
      .repartition(col("v"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val schemesB = schemes.map(_.map(_.toArray).toArray).toArray
    // filter the allowed sub-adjacency, then the same capped inverse-CDF
    // as inverseCdfSample — the form the DuckDB walk oracle replays
    // index-for-index
    val sample = udf {
      (nbrs: Seq[Long], wts: Seq[Double], etypes: Seq[Int],
       schemeId: Int, step: Int, r: Double) =>
        val scheme = schemesB(schemeId)
        val mask = scheme(step % scheme.length)
        val an = scala.collection.mutable.ArrayBuffer[Long]()
        val aw = scala.collection.mutable.ArrayBuffer[Double]()
        var i = 0
        while (i < nbrs.size) {
          val et = etypes(i)
          if (et < mask.length && mask(et)) { an += nbrs(i); aw += wts(i) }
          i += 1
        }
        if (an.isEmpty) None
        else {
          var total = 0.0
          var t = 0
          while (t < aw.size) { total += aw(t); t += 1 }
          val dart = r * total
          var cum = 0.0
          var j = 0
          while (j < an.size - 1 && { cum += aw(j); cum <= dart }) j += 1
          Some(an(j))
        }
    }

    val nSchemes = schemes.size

    var frontier = starts.select(col("walkerId"), lit(0).as("step"), col("curV"),
        pmod(col("walkerId"), lit(nSchemes)).cast("int").as("schemeId"))
      .localCheckpoint(true)
    val history = scala.collection.mutable.ArrayBuffer[DataFrame](frontier)

    var step = 0
    var active = frontier.count()
    while (active > 0 && step < maxSteps) {
      val advanced = frontier
        .join(adj, frontier("curV") === adj("v"))
        .select(col("walkerId"), (col("step") + 1).as("step"),
          sample(col("nbrs"), col("wts"), col("etypes"),
            col("schemeId"), col("step"), randSel(portableRng, seed, "mp")).as("curV"),
          col("schemeId"))
        .filter(col("curV").isNotNull)
      frontier = advanced.localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
      history += frontier
      step += 1
      active = frontier.count()
      System.err.println(s"[graft:meta] step=$step active=$active")
    }
    adj.unpersist()
    history.map(_.select(col("walkerId"), col("step"), col("curV").as("vertex")))
      .reduce(_ unionAll _)
  }

  /** Epoched walk (reference "walk rate", include/walk.hpp:140-144,
    * 703-844): split the walkers into `epochs` contiguous ranges and run
    * each range's walk to completion before the next starts — bounds the
    * in-flight frontier + footprint memory. Same semantics/randomness as
    * one big run (the RNG keys on absolute walkerId). */
  def firstOrderEpoched(
      edges: DataFrame,
      startsFor: (Long, Long) => DataFrame,  // (walkerBegin, walkerEnd) => (walkerId, curV)
      numWalkers: Long,
      epochs: Int,
      maxSteps: Int,
      keepProb: Double = 1.0,
      seed: Long = 42L): DataFrame = {
    val per = math.max(1L, (numWalkers + epochs - 1) / epochs)
    (0L until numWalkers by per).map { begin =>
      val end = math.min(begin + per, numWalkers)
      firstOrder(edges, startsFor(begin, end), maxSteps, keepProb, seed)
    }.reduce(_ unionAll _)
  }

  /** Custom start distribution from an explicit start-vertex table
    * (reference W4, src/apps/ppr.hpp:41-51: walker i starts at
    * startVertices(i mod size) — personalized PageRank source sets). */
  def personalizedStarts(startVertices: DataFrame, numWalkers: Long): DataFrame = {
    val spark = startVertices.sparkSession
    val indexed = graft.derive.Derive.withDenseVid(
      startVertices.select(col("v").as("conv_id")).distinct().withColumn("turn_idx", lit(0)))
      .select(col("conv_id").as("v"), col("vid").as("idx"))
    val nS = indexed.count()
    spark.range(numWalkers)
      .select(col("id").as("walkerId"), pmod(col("id"), lit(nS)).as("idx"))
      .join(indexed, "idx")
      .select(col("walkerId"), col("v").as("curV"))
  }

  /** Assemble per-walker ordered paths from footprints (reference
    * assemble_path, include/path.hpp:164-477 — 310 lines of manual shuffle
    * become one aggregation). */
  def paths(footprints: DataFrame): DataFrame =
    footprints
      .groupBy("walkerId")
      .agg(transform(sort_array(collect_list(struct(col("step"), col("vertex")))),
        x => x.getField("vertex")).as("path"))

  /** Per-vertex visit counts (PPR estimates; reference src/apps/ppr.hpp). */
  def visitCounts(footprints: DataFrame): DataFrame =
    footprints.groupBy(col("vertex").as("v")).agg(count(lit(1)).as("visits"))

  /** Paths as the reference's text dump: `walkerId len v0 v1 ...`
    * (include/path.hpp:94-102). */
  def pathsText(footprints: DataFrame): DataFrame =
    paths(footprints).select(
      concat_ws(" ", col("walkerId"), size(col("path")),
        concat_ws(" ", col("path"))).as("line"))

  /** Per-walker path as a space-joined string column — the driver-
    * checkable projection (array columns are not hashable by the
    * verification harness). */
  def pathStrings(footprints: DataFrame): DataFrame =
    paths(footprints).select(
      col("walkerId"), concat_ws(" ", col("path")).as("path_str"))
}
