package graft.walk

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders, KeyValueGroupedDataset}
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
    * codegen'd alias sampler. Zero total weight terminates the walker
    * (None) — same semantics as the dynamic samplers; without the guard a
    * zero-weight adjacency would deterministically step to the LAST
    * neighbour (dart = r·0 = 0 and every cum <= dart test advances). */
  private val inverseCdfSample =
    udf { (nbrs: Seq[Long], wts: Seq[Double], r: Double) =>
      val n = nbrs.size
      var total = 0.0
      var i = 0
      while (i < n) { total += wts(i); i += 1 }
      if (n == 0 || total <= 0.0) None
      else {
        val dart = r * total
        var cum = 0.0
        var j = 0
        while (j < n - 1 && { cum += wts(j); cum <= dart }) j += 1
        Some(nbrs(j))
      }
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
      if (n == 0 || total <= 0.0) None
      else {
        val dart = r * total
        var j = 0
        while (j < n - 1 && cum(j) <= dart) j += 1
        Some(nbrs(j))
      }
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

  /** Generic outlier-override hooks — the reference's T5 surface
    * (`outlier_upperbound_func` / `outlier_search_func`, include/
    * walk.hpp:197-238; first-order dartboard :981-1014): the user Pd may
    * exceed the declared `upper` on up to `num` declared "outlier" edges
    * per position. The dartboard gains an appendix of `num` strips of
    * width `overflow`; an appendix hit at strip i fetches outlier i via
    * `search` and accepts iff stripPos/Ps(e) + upper ≤ Pd(e), which
    * restores the exact Ps·Pd law for edges whose Pd overflows the
    * regular bound.
    *
    * Contract (the reference asserts it only in UNIT_TEST builds; this
    * engine enforces it loudly on every appendix evaluation): for every
    * declared outlier e, (Pd(e) − upper) · Ps(e) ≤ overflow. Pd must NOT
    * exceed `upper` on any edge the hooks do not declare — that silently
    * skews the law, exactly as in the reference.
    *
    * @param bound  (step, curV, nbrs, wts) → (overflow, num); non-positive
    *               either disables the appendix at this position
    * @param search (step, curV, nbrs, wts, i) → index of the i-th outlier
    *               in the adjacency arrays, or -1 for none */
  final case class OutlierConfig(
      bound: (Int, Long, Seq[Long], Seq[Double]) => (Double, Int),
      search: (Int, Long, Seq[Long], Seq[Double], Int) => Int)

  /** Second-order twin of [[OutlierConfig]]: the reference's outlier
    * hooks receive the walker state (include/walk.hpp:1184-1197), which
    * at second order includes the previous vertex — so both hooks see
    * `prevV`. That is exactly what lets node2vec's return-edge appendix
    * (src/apps/node2vec.hpp:137-139) be expressed as USER hooks on
    * [[generic2Reject]] (RejectSpec does, and gets the specialized
    * engine's law back). Same overflow contract as [[OutlierConfig]].
    *
    * @param bound  (step, prevV, curV, nbrs, wts) → (overflow, num)
    * @param search (step, prevV, curV, nbrs, wts, i) → adjacency index
    *               of the i-th outlier, or -1 (a miss consumes the trial
    *               as a rejection — declare num accurately) */
  final case class OutlierConfig2(
      bound: (Int, Long, Long, Seq[Long], Seq[Double]) => (Double, Int),
      search: (Int, Long, Long, Seq[Long], Seq[Double], Int) => Int)

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
      portableRng: Boolean = false,
      store: Option[graft.engine.Iterate.CheckpointStore] = None,
      runName: String = "gwalk"): DataFrame = {
    config match {
      // trivial bundle → the tuned default path
      case TransitionConfig(Extension.Always, StaticComp.EdgeWeight, None) =>
        firstOrder(edges, starts, maxSteps, 1.0, seed, store, runName, portableRng)
      case TransitionConfig(Extension.Constant(p), StaticComp.EdgeWeight, None) =>
        firstOrder(edges, starts, maxSteps, p, seed, store, runName, portableRng)
      case _ =>
        val spark = edges.sparkSession
        // a projection over the session-cached CSR: the statics column is
        // recomputed per scan (cheap) instead of caching a second copy
        val adj = GraphOps.adjacencyCached(edges)
          .withColumn("statics", config.static match {
            case StaticComp.EdgeWeight => col("wts")
            case StaticComp.Unbiased => transform(col("wts"), _ => lit(1.0))
          })

        val sampler: Column = config.dynamic match {
          case Some(f) =>
            dynSampleUdf(f)(col("step"), col("curV"), col("nbrs"), col("wts"),
              col("statics"), randSel(portableRng, seed, "pd"))
          case None =>
            inverseCdfSample(col("nbrs"), col("statics"), randSel(portableRng, seed, "s"))
        }

        val run = new DurableRun(spark, store, runName, maxSteps,
          s"generic seed=$seed portable=$portableRng ext=${extensionFingerprint(config.extension)} " +
            s"static=${config.static} startsFp=${startsFingerprint(starts)}")
        val history = scala.collection.mutable.ArrayBuffer[DataFrame]()
        var (frontier, step) = run.seed(history,
          starts.select(col("walkerId"), lit(0).as("step"), col("curV")))
        var active = frontier.count()
        while (active > 0 && step < maxSteps) {
          val alive = applyExtension(frontier, config.extension, seed, portableRng)
          val light = active < LightModeThreshold
          // single evaluation of the random extension filter — see
          // firstOrder's light-mode comment
          val aliveL = if (light) lightFrontier(alive) else alive
          val side =
            if (light || active < BroadcastFrontierThreshold) broadcast(aliveL) else aliveL
          val adjSide = if (light) pruneAdjToFrontier(adj, aliveL, "v", "curV") else adj
          val (f2, n) = run.truncateCounted(
            side.join(adjSide, side("curV") === adjSide("v"))
              .select(col("walkerId"), (col("step") + 1).as("step"), sampler.as("curV"))
              .filter(col("curV").isNotNull), step + 1)
          frontier = f2
          history += frontier
          step += 1
          active = n
          System.err.println(s"[graft:$runName] step=$step active=$active")
        }
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
      portableRng: Boolean = false,
      store: Option[graft.engine.Iterate.CheckpointStore] = None,
      runName: String = "gwalk2"): DataFrame = {
    val spark = edges.sparkSession
    // projection over the session-cached CSR (see generic)
    val adj = GraphOps.adjacencyCached(edges)
      .withColumn("statics", config.static match {
        case StaticComp.EdgeWeight => col("wts")
        case StaticComp.Unbiased => transform(col("wts"), _ => lit(1.0))
      })
    val nbrSets = adj.select(col("v").as("pv"), col("nbrs").as("prevNbrs"))

    val firstStep =
      if (portableRng) inverseCdfSample(col("nbrs"), col("statics"), randP(seed, "s"))
      else graft.functions.AliasSampleExpr.sample(col("nbrs"), col("prob"), col("alias"),
        rand(seed, "a1"), rand(seed, "a2"))
    val dyn = dyn2SampleUdf(config.dynamic2)

    val run = new DurableRun(spark, store, runName, maxSteps,
      s"generic2 seed=$seed portable=$portableRng ext=${extensionFingerprint(config.extension)} " +
        s"static=${config.static} startsFp=${startsFingerprint(starts)}")
    val history = scala.collection.mutable.ArrayBuffer[DataFrame]()
    var (frontier, step) = run.seed(history, starts.select(
      col("walkerId"), lit(0).as("step"), col("curV"),
      lit(null).cast("long").as("prevV")))
    var active = frontier.count()
    while (active > 0 && step < maxSteps) {
      val alive = applyExtension(frontier, config.extension, seed, portableRng)
      val light = active < LightModeThreshold
      // single evaluation of the random extension filter — see
      // firstOrder's light-mode comment
      val aliveL = if (light) lightFrontier(alive) else alive
      val frontSide =
        if (light || active < BroadcastFrontierThreshold) broadcast(aliveL) else aliveL
      val adjSide = if (light) pruneAdjToFrontier(adj, aliveL, "v", "curV") else adj
      val nbrSide =
        if (light) broadcast(pruneAdjToFrontier(nbrSets, aliveL, "pv", "prevV"))
        else nbrSets
      val withAdj = frontSide.join(adjSide, frontSide("curV") === adjSide("v"))
      val withPrev = withAdj.join(nbrSide, withAdj("prevV") === nbrSide("pv"), "left")
      val (f2, n) = run.truncateCounted(withPrev.select(
          col("walkerId"),
          (col("step") + 1).as("step"),
          when(col("prevV").isNull, firstStep)
            .otherwise(dyn(col("step"), col("prevV"), col("prevNbrs"), col("nbrs"),
              col("wts"), col("statics"), randSel(portableRng, seed, "n2v"))).as("curV"),
          col("curV").as("prevV"))
        .filter(col("curV").isNotNull), step + 1)
      frontier = f2
      history += frontier
      step += 1
      active = n
      System.err.println(s"[graft:$runName] step=$step active=$active")
    }
    history.map(_.select(col("walkerId"), col("step"), col("curV").as("vertex")))
      .reduce(_ unionAll _)
  }

  /** Arbitrary per-walker user state — the reference's `walker_data_t`
    * surface (WalkerConfig.walker_init_state_func /
    * walker_update_state_func, include/walk.hpp:154-190): each walker
    * carries a typed user state S, Pd may read it, and `update` evolves
    * it on every accepted step. Metapath's scheme id is one instance
    * ([[metapathOnGeneric]], cf. reference src/apps/metascheme.hpp:36-40);
    * the reference's walker-state hash-chain test family
    * (src/tests/test_walker.cpp:45-318) is ported against this API in
    * WalkerStateSpec.
    *
    * @param init      (walkerId, startVertex) → initial state
    * @param bias      Pd(step, state, curV, dst, edgeWeight, edata) → ≥ 0;
    *                  candidates with static·bias <= 0 are excluded BEFORE
    *                  the inverse-CDF draw (a vertex with no positive
    *                  candidate terminates the walker — reference Pe
    *                  vertex-mask semantics)
    * @param update    (state, walkerId, curV, nextV) → state after moving
    * @param extension Pe(step, state, curV) → continue probability (may
    *                  read the state, unlike the column engines)
    */
  final case class StatefulConfig[S](
      init: (Long, Long) => S,
      bias: (Int, S, Long, Long, Double, Long) => Double,
      update: (S, Long, Long, Long) => S,
      extension: (Int, S, Long) => Double = (_: Int, _: Any, _: Long) => 1.0,
      static: StaticComp = StaticComp.EdgeWeight)

  /** First-order walk threading arbitrary typed walker state through every
    * step — the engine half of the reference's `walker_data_t` contract.
    * The frontier is a typed Dataset[(walkerId, step, curV, state)]; each
    * step is one co-partitioned joinWith against the (edata-carrying)
    * adjacency plus a flatMap that draws the exact Pd distribution and
    * applies `update`. Output: footprints (walkerId, step, vertex, state)
    * where `state` is the walker's state ON ARRIVAL at `vertex` — the
    * hash-chain test recomputes it from the path and compares exactly.
    *
    * Randomness keys on (seed, walkerId, step) only (partition- and
    * resume-independent); `portableRng` selects the md5 stream shared
    * with the column engines so [[metapathOnGeneric]] is draw-for-draw
    * identical to [[metapath]]. */
  def genericStateful[S](
      edges: DataFrame,               // (src, dst, weight[, edata: long])
      starts: DataFrame,              // (walkerId, curV)
      maxSteps: Int,
      config: StatefulConfig[S],
      seed: Long = 42L,
      portableRng: Boolean = false,
      sampleSalt: String = "gs",
      store: Option[graft.engine.Iterate.CheckpointStore] = None,
      runName: String = "gstate",
      rejectBounds: Option[(Double, Double, Int)] = None)(
      implicit senc: Encoder[S]): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._

    val eData =
      if (edges.columns.contains("edata")) edges
      else edges.withColumn("edata", lit(0L))
    // neighbour order: sorted by dst — identical to GraphOps.adjacency
    // and the metapath adjacency, so samplers see the same candidate
    // order; serialized+spillable storage like every other CSR cache
    val adj = eData
      .groupBy(col("src").as("v"))
      .agg(sort_array(collect_list(struct(col("dst"), col("weight"), col("edata")))).as("a"))
      .select(col("v"), col("a.dst").as("nbrs"), col("a.weight").as("wts"),
        col("a.edata").as("edatas"))
      .repartition(col("v"))
      .sortWithinPartitions("v")
      .persist(StorageLevel.MEMORY_AND_DISK_SER)
    val adjDs = adj.as[(Long, Seq[Long], Seq[Double], Seq[Long])]

    implicit val fEnc: Encoder[(Long, Int, Long, S)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaInt, Encoders.scalaLong, senc)

    val unbiased = config.static == StaticComp.Unbiased
    val cfg = config

    // a val (not a local def): local defs lift onto Walk$, and a closure
    // calling one would have to serialize the whole module
    val seedL = seed
    val rnd: (Long, Int, String, Long) => Double =
      if (portableRng)
        (wid, step, salt, _) =>
          graft.text.TextOps.h64jvm(s"$seedL:$wid:$step:$salt").toDouble /
            1152921504606846976.0 // 2^60 — exact twin of randP
      else
        (wid, step, _, saltId) => Walk.jvmRand(seedL, wid, step, saltId)

    def asFp(f: Dataset[(Long, Int, Long, S)]): DataFrame =
      f.toDF("walkerId", "step", "vertex", "state")
    // durable round-trip back to the typed frontier: the footprint DF's
    // named columns map to the tuple encoder's _1.._4 (S round-trips
    // through Parquet for any product/primitive encoder)
    def asTyped(df: DataFrame): Dataset[(Long, Int, Long, S)] =
      df.select(col("walkerId").as("_1"), col("step").as("_2"),
        col("vertex").as("_3"), col("state").as("_4")).as[(Long, Int, Long, S)]

    // durable store/resume: same DurableRun scaffolding as the column
    // engines (reference per-epoch path flush applies to ALL walks,
    // include/walk.hpp:703-844); user lambdas (init/bias/update/
    // extension) cannot be fingerprinted — keeping them stable across
    // resumes is the caller's contract (see checkManifest)
    val run = new DurableRun(spark, store, runName, maxSteps,
      s"genericStateful seed=$seed portable=$portableRng salt=$sampleSalt " +
        s"static=${cfg.static} startsFp=${startsFingerprint(starts)}" +
        rejectBounds.map(b => s" reject=$b").getOrElse(""))
    val portable = portableRng
    val rejB = rejectBounds
    val accPre = spark.sparkContext.longAccumulator(s"$runName-rejPre")
    val accEval = spark.sparkContext.longAccumulator(s"$runName-rejEval")
    val history = scala.collection.mutable.ArrayBuffer[DataFrame]()
    val (f0, step0) = run.seed(history, asFp(starts
      .select(col("walkerId"), col("curV")).as[(Long, Long)]
      .map { case (wid, v) => (wid, 0, v, cfg.init(wid, v)) }))
    var frontier: Dataset[(Long, Int, Long, S)] = asTyped(f0)
    var step = step0
    var active = frontier.count()
    while (active > 0 && step < maxSteps) {
      // light-mode tail (see firstOrder): broadcast the tiny frontier and
      // prune the CSR scan to its vertices — the frontier is checkpointed,
      // so the IN-set collect and the join side see the same rows
      val light = active < LightModeThreshold
      val frontSide = if (light) broadcast(frontier) else frontier
      val adjSide =
        if (light) {
          val vs = frontier.map(_._3).distinct().collect()
          if (vs.isEmpty) adjDs.filter(lit(false)) else adjDs.filter(col("v").isin(vs: _*))
        } else adjDs
      val joined = frontSide.joinWith(adjSide, frontSide("_3") === adjSide("v"))
      val advanced = joined.flatMap { case ((wid, st, cur, state), (_, nbrs, wts, edatas)) =>
        val pe = cfg.extension(st, state, cur)
        if (pe < 1.0 && rnd(wid, st, "keep", 1L) >= pe) Iterator.empty[(Long, Int, Long, S)]
        else rejB match {
          case None =>
            val n = nbrs.size
            val an = new scala.collection.mutable.ArrayBuffer[Long](n)
            val aw = new scala.collection.mutable.ArrayBuffer[Double](n)
            var i = 0
            while (i < n) {
              val s0 = if (unbiased) 1.0 else wts(i)
              val bw = s0 * cfg.bias(st, state, cur, nbrs(i), wts(i), edatas(i))
              if (bw > 0.0) { an += nbrs(i); aw += bw }
              i += 1
            }
            var total = 0.0
            var t = 0
            while (t < aw.size) { total += aw(t); t += 1 }
            if (an.isEmpty || total <= 0.0) Iterator.empty
            else {
              // same capped inverse-CDF as the column samplers
              val dart = rnd(wid, st, sampleSalt, 2L) * total
              var cum = 0.0
              var j = 0
              while (j < an.size - 1 && { cum += aw(j); cum <= dart }) j += 1
              val nxt = an(j)
              Iterator.single((wid, st + 1, nxt, cfg.update(state, wid, cur, nxt)))
            }
          case Some((ub, lb, mt)) =>
            // the reference's LOCAL rejection loop over a STATE-reading
            // bias (walk.hpp:1030-1040 × the walker_data_t surface):
            // propose from the statics, pre-accept darts ≤ lb without
            // calling the user bias, otherwise evaluate it once; mt
            // straight rejections take one exact Ps·bias draw
            // (distribution-neutral — same accept-conditional law)
            val n = nbrs.size
            def stat(i: Int): Double = if (unbiased) 1.0 else wts(i)
            var total = 0.0
            var i = 0
            while (i < n) { total += stat(i); i += 1 }
            if (n == 0 || total <= 0.0) Iterator.empty[(Long, Int, Long, S)]
            else {
              def rT(trial: Int, k: Int): Double =
                if (portable)
                  graft.text.TextOps.h64jvm(
                    s"$seedL:$wid:$st:$trial:${RejectSaltsP(k)}").toDouble /
                    1152921504606846976.0 // 2^60
                else jvmRand(seedL, wid, (st.toLong << 20) | trial.toLong,
                  RejectSaltsJ(k))
              var trial = 0
              var dst = -1L
              while (dst < 0 && trial < mt) {
                val dart = rT(trial, 0) * total
                var cum = 0.0
                var j = 0
                while (j < n - 1 && { cum += stat(j); cum <= dart }) j += 1
                val u = rT(trial, 1) * ub
                if (u <= lb) { accPre.add(1L); dst = nbrs(j) }
                else {
                  val pd = cfg.bias(st, state, cur, nbrs(j), wts(j), edatas(j))
                  require(pd <= ub && pd >= lb,
                    s"user bias $pd outside declared bounds [$lb, $ub] " +
                      s"(step=$st curV=$cur cand=${nbrs(j)})")
                  accEval.add(1L)
                  if (u <= pd) dst = nbrs(j)
                }
                trial += 1
              }
              if (dst >= 0)
                Iterator.single((wid, st + 1, dst, cfg.update(state, wid, cur, dst)))
              else {
                val bw = new Array[Double](n)
                var bt = 0.0
                var k2 = 0
                while (k2 < n) {
                  bw(k2) = stat(k2) * cfg.bias(st, state, cur, nbrs(k2), wts(k2), edatas(k2))
                  bt += bw(k2); k2 += 1
                }
                accEval.add(n.toLong)
                if (bt <= 0.0) Iterator.empty[(Long, Int, Long, S)]
                else {
                  val dart2 = rT(mt, 2) * bt
                  var cum = 0.0
                  var j = 0
                  while (j < n - 1 && { cum += bw(j); cum <= dart2 }) j += 1
                  val nxt = nbrs(j)
                  Iterator.single((wid, st + 1, nxt, cfg.update(state, wid, cur, nxt)))
                }
              }
            }
        }
      }
      val truncated = run.truncate(asFp(advanced), step + 1)
      frontier = asTyped(truncated)
      history += truncated
      step += 1
      active = frontier.count()
      System.err.println(s"[graft:$runName] step=$step active=$active")
    }
    adj.unpersist(false)
    if (rejB.nonEmpty) {
      logReject((accPre.value, 0L, accEval.value))
      System.err.println(s"[graft:$runName] reject totals: " +
        s"preaccept=${accPre.value} biasEvals=${accEval.value}")
    }
    history.reduce(_ unionAll _)
  }

  /** [[genericStateful]] sampled by REJECTION under user-declared dynamic
    * bounds — the composition of the reference's full `walker_data_t`
    * surface with its `dcomp_upperbound_func`/`dcomp_lowerbound_func`
    * strategy (include/walk.hpp:154-190 × :241-271, local loop
    * :1030-1040): the bias hook reads the walker's typed state, darts ≤
    * `lower` accept without calling it, and `maxTrials` straight
    * rejections take one exact Ps·bias draw (distribution-neutral;
    * zero-dynamic-mass positions get the exact engine's death). Same law
    * as [[genericStateful]] with the same config — RejectSpec pins the
    * state-conditional frequency law and the eval-count ordering.
    *
    * @param upper must dominate every bias value (for every state)
    * @param lower must not exceed any bias value (0 disables pre-accept) */
  def genericStatefulReject[S](
      edges: DataFrame,
      starts: DataFrame,
      maxSteps: Int,
      config: StatefulConfig[S],
      upper: Double,
      lower: Double = 0.0,
      maxTrials: Int = 64,
      seed: Long = 42L,
      portableRng: Boolean = false,
      store: Option[graft.engine.Iterate.CheckpointStore] = None,
      runName: String = "gstaterej")(implicit senc: Encoder[S]): DataFrame = {
    require(upper > 0 && lower >= 0 && lower <= upper,
      s"need 0 <= lower <= upper and upper > 0 (got lower=$lower upper=$upper)")
    require(maxTrials >= 1, s"maxTrials must be >= 1 (got $maxTrials)")
    genericStateful(edges, starts, maxSteps, config, seed, portableRng,
      sampleSalt = "gs", store, runName,
      rejectBounds = Some((upper, lower, maxTrials)))
  }

  /** [[genericStateful]] with LOCAL CHAINING — the reference's local
    * chaining lives in the ENGINE, not the apps (include/walk.hpp:
    * 1056-1063), so every user-defined `walker_data_t` walk gets it; r3
    * only chained the three shipped column kernels, leaving the richest
    * API join-per-step (VERDICT r3 "missing" #2). Same bucketed cogroup
    * shape as [[firstOrderChained]]; inside a bucket the walker chains
    * many steps, calling the user's Pe/bias/update lambdas locally;
    * bucket-crossers re-shuffle carrying their typed state S (the
    * reference ships `walker_data_t` in its walker messages the same
    * way — state size on crossing rows is the caller's design contract).
    *
    * BITWISE-identical to [[genericStateful]]: both engines draw from the
    * same partition-independent (seed, walkerId, step, salt) streams and
    * filter/scan candidates in the same order — WalkerStateSpec asserts
    * footprints AND threaded states are equal across engines and bucket
    * counts. */
  def genericStatefulChained[S](
      edges: DataFrame,               // (src, dst, weight[, edata: long])
      starts: DataFrame,              // (walkerId, curV)
      maxSteps: Int,
      config: StatefulConfig[S],
      seed: Long = 42L,
      portableRng: Boolean = false,
      sampleSalt: String = "gs",
      buckets: Int = 0,
      tailThreshold: Long = LightModeThreshold,
      store: Option[graft.engine.Iterate.CheckpointStore] = None,
      runName: String = "chain-gs")(implicit senc: Encoder[S]): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val nBuckets =
      if (buckets > 0) buckets else math.max(spark.sparkContext.defaultParallelism * 2, 4)
    val maxV = edges.agg(greatest(max("src"), max("dst"))).head().getLong(0)
    val rangeSize = math.max(1L, maxV / nBuckets + 1)

    val eData =
      if (edges.columns.contains("edata")) edges
      else edges.withColumn("edata", lit(0L))
    // same sorted neighbour order as genericStateful's CSR — parity of
    // candidate scan order is part of the bitwise contract; v top-level +
    // sorted for the tail's pruned fetches (see
    // GraphOps.bucketedAdjacencyCached)
    val adjDf = eData
      .groupBy(col("src").as("v"))
      .agg(sort_array(collect_list(struct(col("dst"), col("weight"), col("edata")))).as("a"))
      .select(col("v"), col("a.dst").as("nbrs"), col("a.weight").as("wts"),
        col("a.edata").as("edatas"))
      .as[graft.model.EdataAdjRow]
      .map(a => (a.v / rangeSize, a.v, a))
      .toDF("bucket", "v", "adj")
      .repartition(col("bucket")) // shuffled once at build — see bucketKeyed
      .sortWithinPartitions("v")
      .persist(StorageLevel.MEMORY_AND_DISK_SER)
    adjDf.count()
    def typedAdj(df: DataFrame) = bucketKeyed[graft.model.EdataAdjRow](df)
    val adjB = typedAdj(adjDf)

    val unbiased = config.static == StaticComp.Unbiased
    val cfg = config
    val seedL = seed
    // same RNG streams as genericStateful (see its scaladoc)
    val rnd: (Long, Int, String, Long) => Double =
      if (portableRng)
        (wid, step, salt, _) =>
          graft.text.TextOps.h64jvm(s"$seedL:$wid:$step:$salt").toDouble /
            1152921504606846976.0 // 2^60
      else
        (wid, step, _, saltId) => Walk.jvmRand(seedL, wid, step, saltId)

    implicit val fEnc: Encoder[(Long, Int, Long, S)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaInt, Encoders.scalaLong, senc)
    implicit val oEnc: Encoder[(Long, Int, Long, S, Boolean)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaInt, Encoders.scalaLong, senc,
        Encoders.scalaBoolean)

    // durable round-trip back to the typed frontier — the stored round's
    // named columns map to the tuple encoder's _1.._4 (S round-trips
    // through Parquet for any product/primitive encoder, exactly as in
    // genericStateful's asTyped)
    def typedFrontier(df: DataFrame): Dataset[(Long, Int, Long, S)] =
      df.select(col("walkerId").as("_1"), col("step").as("_2"),
        col("vertex").as("_3"), col("state").as("_4")).as[(Long, Int, Long, S)]

    // user lambdas (init/bias/update/extension) cannot be fingerprinted —
    // keeping them stable across resumes is the caller's contract
    val run = new DurableChainedRun(spark, store, runName,
      s"genericStatefulChained seed=$seed portable=$portableRng salt=$sampleSalt " +
        s"static=${config.static} maxSteps=$maxSteps " +
        s"startsFp=${startsFingerprint(starts)}")
    val history = scala.collection.mutable.ArrayBuffer[DataFrame]()
    val roundCaches = scala.collection.mutable.ArrayBuffer[DataFrame]()
    var outer = 0
    var frontier: Dataset[(Long, Int, Long, S)] = run.resume() match {
      case Some((rounds, hi)) =>
        rounds.zipWithIndex.foreach { case (df, r) =>
          history += (if (r == 0) df else df.filter(!col("moved")))
            .select(col("walkerId"), col("step"), col("vertex"), col("state"))
        }
        outer = hi
        typedFrontier(rounds.last.filter(col("moved")))
      case None =>
        val f0 = starts
          .select(col("walkerId"), col("curV")).as[(Long, Long)]
          .map { case (wid, v) => (wid, 0, v, cfg.init(wid, v)) }
          .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
        history += f0.toDF("walkerId", "step", "vertex", "state")
        if (run.durable)
          run.commitRound(0, f0.toDF("walkerId", "step", "vertex", "state")
            .withColumn("moved", lit(true)), roundCaches)
        f0
    }
    var active = frontier.count()
    try {
      while (active > 0 && outer <= maxSteps) {
        if (active <= tailThreshold) {
          // driver-local tail — see chainedDriverTail; the typed state S
          // rides the collected tuples, and the user lambdas run on the
          // driver exactly as they run inside the cogroup kernel
          val foot = chainedDriverTail[(Long, Int, Long, S),
              graft.model.EdataAdjRow, (Long, Int, Long, S)](
            frontier.collect(),
            neededOf = w => Seq(w._3),
            fetch = vs => fetchByVertex(adjDf, vs)(_.as[graft.model.EdataAdjRow].collect()),
            fetchAll = lim =>
              fetchAllRows(adjDf, lim)(_.as[graft.model.EdataAdjRow].collect()),
            vOf = _.v,
            degOf = _.nbrs.length,
            advance = { (w, look) =>
              val rows = scala.collection.mutable.ArrayBuffer[(Long, Int, Long, S)]()
              var (walkerId, step, cur, state) = w
              var parked: Option[(Long, Int, Long, S)] = None
              var done = false
              while (!done && step < maxSteps) {
                look(cur) match {
                  case TailUnfetched =>
                    parked = Some((walkerId, step, cur, state)); done = true
                  case TailDangling => done = true
                  case TailHave(a) =>
                    val (nxt, st2) = statefulStepKernel(a, walkerId, step, state,
                      cfg, unbiased, rnd, sampleSalt)
                    if (nxt < 0) done = true
                    else {
                      state = st2
                      step += 1
                      cur = nxt
                      rows += ((walkerId, step, cur, state))
                    }
                }
              }
              (rows.toSeq, parked)
            },
            label = "chain-gs")
          val footDf = spark.createDataset(foot)(fEnc)
            .toDF("walkerId", "step", "vertex", "state")
          history += (if (run.durable)
            run.commitRound(outer + 1, footDf.withColumn("moved", lit(false)),
                roundCaches)
              .select(col("walkerId"), col("step"), col("vertex"), col("state"))
          else footDf)
          active = 0
        } else {
          val grouped = frontier.groupByKey(_._3 / rangeSize)
          // live-bucket CSR prune — see prunedAdjRound
          val adjRound = prunedAdjRound(adjDf, frontier.map(_._3 / rangeSize)
                .distinct().collect(),
              engage = outer >= 1 || active < BucketPruneThreshold, nBuckets)
            .map(typedAdj).getOrElse(adjB)
          val out = grouped.cogroup(adjRound) { (bucket, ws, adjIt) =>
            val csr = new scala.collection.mutable.HashMap[Long, graft.model.EdataAdjRow]
            adjIt.foreach { case (_, a) => csr.update(a.v, a) }
            ws.flatMap { case (walkerId, step0, v0, state0) =>
              val rows =
                scala.collection.mutable.ArrayBuffer[(Long, Int, Long, S, Boolean)]()
              var step = step0
              var cur = v0
              var state = state0
              var done = false
              while (!done && step < maxSteps && cur / rangeSize == bucket) {
                csr.get(cur) match {
                  case None => done = true // dangling: terminate
                  case Some(a) =>
                    val (nxt, st2) = statefulStepKernel(a, walkerId, step, state,
                      cfg, unbiased, rnd, sampleSalt)
                    if (nxt < 0) done = true
                    else {
                      state = st2
                      step += 1
                      cur = nxt
                      rows += ((walkerId, step, cur, state, false)) // footprint
                    }
                }
              }
              if (!done && step < maxSteps && cur / rangeSize != bucket)
                rows += ((walkerId, step, cur, state, true)) // crossed: re-shuffle
              rows
            }
          }.toDF("walkerId", "step", "vertex", "state", "moved")
          // r4 round shape — see firstOrderChained/sealChained (durable
          // runs commit the round's Parquet instead of the cache)
          val outP = run.commitRound(outer + 1, out, roundCaches)
          history += outP.filter(!col("moved"))
            .select(col("walkerId"), col("step"), col("vertex"), col("state"))
          val (f2, n) = truncateRealCounted(typedFrontier(outP.filter(col("moved"))))
          frontier = f2
          outer += 1
          active = n
          System.err.println(s"[graft:chain-gs] outer=$outer active=$active")
        }
      }
      sealChained(history.toSeq, roundCaches.toSeq)
    } catch {
      case e: Throwable =>
        roundCaches.foreach(_.unpersist(false))
        throw e
    } finally {
      // run-local CSR: always released, also when a round throws (ADVICE r4)
      adjDf.unpersist(false)
    }
  }

  /** [[metapath]] re-expressed on the generic stateful API — proof that
    * `walker_data_t` subsumes the metapath app (the reference carries
    * (scheme_id, state) through exactly this surface,
    * src/apps/metascheme.hpp:36-40): state = schemeId, Pd masks the edge
    * type by the scheme's per-step mask. Draw-for-draw identical to
    * [[metapath]] under portableRng — same "mp" salt, same filtered
    * inverse-CDF, same neighbour order (WalkerStateSpec). */
  def metapathOnGeneric(
      edges: DataFrame,               // (src, dst, weight, etype)
      starts: DataFrame,
      schemes: Seq[Seq[Seq[Boolean]]],
      maxSteps: Int,
      seed: Long = 42L,
      portableRng: Boolean = false): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val schemesB = schemes.map(_.map(_.toArray).toArray).toArray
    val nSchemes = schemes.size
    val cfg = StatefulConfig[Int](
      init = (wid, _) => (wid % nSchemes).toInt,
      bias = (step, schemeId, _, _, _, edata) => {
        val scheme = schemesB(schemeId)
        val mask = scheme(step % scheme.length)
        val et = edata.toInt
        // et outside [0, |mask|) — including a negative sentinel from a
        // bad upstream cast — is simply not on the scheme: bias 0
        if (et >= 0 && et < mask.length && mask(et)) 1.0 else 0.0
      },
      update = (s, _, _, _) => s)
    genericStateful(edges.withColumn("edata", col("etype").cast("long")), starts,
      maxSteps, cfg, seed, portableRng, sampleSalt = "mp")
      .select(col("walkerId"), col("step"), col("vertex"))
  }

  /** Walker start vertices: walker i starts at the vertex of dense rank
    * (i mod |V|) — the reference's default equal distribution
    * (include/walk.hpp:403-411). */
  def equalStarts(edges: DataFrame, numWalkers: Long): DataFrame = {
    val spark = edges.sparkSession
    val (indexed, nV) = denseIndexOf(GraphOps.vertices(edges))
    spark.range(numWalkers).select(col("id").as("walkerId"), pmod(col("id"), lit(nV)).as("idx"))
      .join(indexed, "idx")
      .select(col("walkerId"), col("v").as("curV"))
  }

  /** Uniform random starts: vertex of dense rank h64(walker) mod |V|
    * (reference include/walk.hpp:413-421, made deterministic; md5-based
    * so the DuckDB walk oracles replay the start assignment too). */
  def uniformStarts(edges: DataFrame, numWalkers: Long, seed: Long): DataFrame = {
    val spark = edges.sparkSession
    val (indexed, nV) = denseIndexOf(GraphOps.vertices(edges))
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

  /** Frontier size below which a HEAVY-mode step still broadcasts the
    * frontier side of the per-step join (r6, guide §3.1): a frontier row
    * is 3-4 longs (~32 B framed), so up to this many rows the broadcast
    * relation stays well under the default 10 MB auto-broadcast bound —
    * the join then streams the cached CSR in place with NO exchange and
    * NO per-step sort, where the planner (blind behind the checkpoint's
    * statless LogicalRDD) fell back to shuffling+sorting both sides.
    * Unlike light mode there is no IN-set prune (a >4k-literal predicate
    * costs more to plan than it saves), so this is purely the join-side
    * choice. Gated on the MEASURED per-step `active` count — data-
    * adaptive, not core-count-derived; a 100 TB frontier simply stays on
    * the shuffle path. */
  val BroadcastFrontierThreshold = 262144L

  /** Frontier size below which round-0 of the chained kernels already
    * prunes the CSR side (rounds >= 1 always prune — the crosser frontier
    * is a small subset of buckets, and re-shuffling the whole adjacency
    * per outer round was the worst-scaling phase of r2's BENCH). */
  val BucketPruneThreshold = 100000L

  /** Crossing walkers in [[node2vecChained]] carry their previous
    * vertex's neighbour list; above this degree the array is NOT shipped
    * (a 1M-degree hub would put MBs on every crossing row and into the
    * per-round checkpoint) — the walker is flagged and prevNbrs is
    * re-resolved by one broadcast-frontier lookup join at the start of
    * the next round, off the checkpoint path. */
  val CrosserNbrsCap = 1024

  /** Test hook: one (prunedBuckets, totalBuckets) entry per hub-crosser
    * prevNbrs resolution in [[node2vecChained]] — WalkerStateSpec asserts
    * the resolution join scans a strict subset of the CSR's buckets
    * (o(|CSR|) rows on the bucket-partitioned cache), not the full
    * adjacency (VERDICT r3 "what's wrong" #1). */
  private[graft] val resolutionLog =
    new java.util.concurrent.ConcurrentLinkedQueue[(Int, Int)]()

  /** Bounded append to [[resolutionLog]]: the queue is a test hook, not a
    * metrics store — a long-lived session walking hub-heavy graphs must
    * not accumulate entries forever (ADVICE r4). */
  private def logResolution(entry: (Int, Int)): Unit = {
    while (resolutionLog.size() >= 10000) resolutionLog.poll()
    resolutionLog.add(entry)
    ()
  }

  /** Test hook: one (preaccepted, appendixAccepted, membershipJoined)
    * entry per [[node2vecReject]] outer iteration — RejectSpec asserts
    * the lower-bound pre-accept (T4) keeps rows OUT of the membership
    * join and the outlier appendix (T5) fires when 1/p > ub. Bounded
    * like [[resolutionLog]] (same ADVICE r4 rationale). */
  private[graft] val rejectLog =
    new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Long)]()

  private def logReject(entry: (Long, Long, Long)): Unit = {
    while (rejectLog.size() >= 10000) rejectLog.poll()
    rejectLog.add(entry)
    ()
  }

  /** Total neighbour ids the chained driver tail may hold in its local
    * adjacency map before evicting (≈ 64 MB of longs) — a tail can touch
    * up to tailThreshold × maxSteps distinct vertices over its lifetime,
    * and hub rows are shared by reference, so this caps the only
    * unbounded driver-side structure. */
  val TailNbrBudget = 8L * 1024 * 1024

  /** Driver-tail adjacency lookup outcome: the local map either has the
    * row, proved the vertex dangling (a fetch asked for it and the CSR
    * returned nothing — no out-edges), or hasn't fetched it yet. */
  private sealed trait TailAdj[+A]
  private final case class TailHave[A](a: A) extends TailAdj[A]
  private case object TailDangling extends TailAdj[Nothing]
  private case object TailUnfetched extends TailAdj[Nothing]

  /** Vertex-level IN-set fetch against a persisted CSR keyed by top-level
    * sorted `v`: reads o(|CSR|) rows via cached-batch min/max pruning.
    *
    * The batch-stat filter builder handles `In` (literal list) but NOT
    * `InSet` (verified against this Spark's
    * SimpleMetricsCachedBatchSerializer.buildFilter), and the optimizer
    * rewrites In→InSet above inSetConversionThreshold (default 10) — so
    * the threshold is raised for the duration of this query's planning,
    * keeping the predicate prunable. Restored in finally: the InSet form
    * is the right one for every other query. */
  private def fetchByVertex[A](
      adjDf: DataFrame, vs: Seq[Long])(collect: DataFrame => Array[A]): Array[A] = {
    val spark = adjDf.sparkSession
    val key = "spark.sql.optimizer.inSetConversionThreshold"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, (vs.size + 1).toString)
    try collect(adjDf.filter(col("v").isin(vs: _*)).select(col("adj.*")))
    finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Driver-local tail for the chained kernels — the chained analogue of
    * the join engines' light mode (reference include/walk.hpp:934: comm
    * drops to a skeleton crew when active < 4000; its local chaining
    * never re-ships the graph, include/walk.hpp:1056-1063).
    *
    * When the crosser frontier fits [[LightModeThreshold]], a cogroup
    * round still shipped the whole bucketed CSR through the exchange to
    * advance a handful of walkers — a fixed o(|E|) cost per tail round
    * that erased the chaining win (BENCH r4: node2vec_chained efficiency
    * 0.41, 60-70% of the phase). Here instead: collect the frontier,
    * then loop — fetch the adjacency rows of exactly the vertices the
    * walkers stand on (vertex-pruned scan of the persisted CSR: zero
    * shuffle, o(|CSR|) rows), and advance every walker driver-side with
    * the SAME step kernel the cogroup path runs, until it terminates,
    * exhausts maxSteps, or reaches an unfetched vertex (→ next fetch).
    * Fetched rows accumulate in a budget-bounded local map, so walkers
    * circling a neighbourhood never refetch it.
    *
    * Bitwise parity with the cogroup path holds by construction: both
    * call the same per-step kernel, and the RNG keys on (seed, walkerId,
    * step) only.
    *
    * @param advance chain one walker against the lookup; returns its new
    *                footprint rows plus Some(parked walker) iff it
    *                stopped on a TailUnfetched vertex */
  /** Whole-CSR row cap for the tail's one-shot probe (r6): when the
    * ENTIRE bucketed CSR fits this many rows, the tail fetches it once
    * and never parks a walker again — the whole tail costs ONE Spark job
    * instead of ~one vertex-level fetch per step (the scattered tool-edge
    * jumps otherwise discover a new vertex set every pass). The probe
    * asks for cap+1 rows through a limit, so at 100 TB it reads a bounded
    * prefix, notices the overflow, and the tail stays on vertex-pruned
    * IN-set fetches exactly as before. The row cap is a first bound; the
    * REAL memory bound is [[TailNbrBudget]], enforced row-by-row during
    * the insert — a hub-heavy prefix aborts the full-fetch attempt (the
    * rows inserted so far stay valid) and the tail continues vertex-
    * pruned. */
  // var (not val) as a test hook: R06OptSpec pins it to 0 to force the
  // overflow branch (vertex-pruned IN-set fetches) at test scale and
  // asserts bitwise equality with the full-fetch path
  @volatile var TailFullFetchRowCap: Int = 262144

  private def chainedDriverTail[W: scala.reflect.ClassTag, A, F](
      walkers0: Array[W],
      neededOf: W => Seq[Long],
      fetch: Seq[Long] => Array[A],
      fetchAll: Int => Array[A],
      vOf: A => Long,
      degOf: A => Int,
      advance: (W, Long => TailAdj[A]) => (Seq[F], Option[W]),
      label: String): Seq[F] = {
    val csr = new scala.collection.mutable.HashMap[Long, A]()
    val dangling = new scala.collection.mutable.HashSet[Long]()
    // true once the FULL CSR sits in `csr`: absence proves a vertex
    // dangling, no walker parks again, no further fetches can occur
    var allFetched = false
    var triedFull = false
    var nbrBudget = 0L
    var live = walkers0
    val out = new scala.collection.mutable.ArrayBuffer[F]()
    var fetches = 0
    while (live.nonEmpty) {
      val needed =
        if (allFetched) Seq.empty
        else live.iterator.flatMap(neededOf)
          .filter(v => !csr.contains(v) && !dangling(v)).toSet.toSeq
      if (needed.nonEmpty) {
        if (nbrBudget > TailNbrBudget) {
          // refetch-on-demand eviction: parked walkers re-request what
          // they still need; shared hub arrays stay alive via walker refs
          // (cannot fire after a successful full fetch — needed is empty)
          csr.clear(); nbrBudget = 0L
        }
        var served = false
        if (!triedFull) {
          triedFull = true
          val rows = fetchAll(TailFullFetchRowCap + 1)
          fetches += 1
          if (rows.length <= TailFullFetchRowCap) {
            var i = 0
            var fits = true
            while (i < rows.length && fits) {
              val a = rows(i)
              csr.update(vOf(a), a)
              nbrBudget += degOf(a)
              if (nbrBudget > TailNbrBudget) fits = false // abort: rows kept, not "all"
              i += 1
            }
            allFetched = fits
            served = fits
          } // else: CSR too large to hold driver-side — vertex mode below
        }
        if (!served) {
          fetch(needed).foreach { a => csr.update(vOf(a), a); nbrBudget += degOf(a) }
          needed.foreach(v => if (!csr.contains(v)) { dangling += v; () })
          fetches += 1
        }
      }
      val lookup: Long => TailAdj[A] = v =>
        csr.get(v) match {
          case Some(a) => TailHave(a)
          case None =>
            if (dangling(v) || allFetched) TailDangling else TailUnfetched
        }
      live = live.flatMap { w =>
        val (foot, parked) = advance(w, lookup)
        out ++= foot
        parked
      }
    }
    System.err.println(
      s"[graft:$label] driver tail: ${walkers0.length} walkers finished in " +
        s"$fetches pruned fetches, ${out.length} footprints, zero exchange")
    out.toSeq
  }

  /** One-shot capped CSR probe for the driver tail: the persisted
    * bucketed CSR through a row limit, so an at-scale CSR reads only a
    * bounded prefix before the overflow is noticed. */
  private def fetchAllRows[A](
      adjDf: DataFrame, limit: Int)(
      collect: DataFrame => Array[A]): Array[A] =
    collect(adjDf.limit(limit).select(col("adj.*")))

  /** Relationally-keyed CSR side for the chained cogroups (r6): grouping
    * by the materialized `bucket` COLUMN (not an opaque groupByKey
    * lambda) lets EnsureRequirements see that the persisted cache is
    * already hash-partitioned by bucket, so the cogroup adds NO exchange
    * on the CSR side — the graph is shuffled once at cache build, never
    * per walk call. Key values are identical to the old lambda (the
    * column IS v / rangeSize), so kernel inputs are unchanged row-for-row
    * (ChainSpec bitwise parity covers it). */
  private def bucketKeyed[A: Encoder](df: DataFrame)(
      implicit tup: Encoder[(Long, A)]): KeyValueGroupedDataset[Long, (Long, A)] =
    // the grouping expression is aliased "value" to mirror the walker
    // side's groupByKey key schema exactly (CoGroup requires equal
    // grouping schemas), while the data row stays the exact (bucket,
    // adj) pair the tuple deserializer expects; ProjectExec rewrites the
    // cached HashPartitioning(bucket) through the alias, so the CSR side
    // still satisfies the cogroup's distribution with no exchange
    df.select(col("bucket").as("_1"), col("adj").as("_2"))
      .groupBy(col("_1").as("value"))
      .as[Long, (Long, A)](Encoders.scalaLong, tup)

  /** The live-bucket CSR prune shared by the four chained kernels: rounds
    * ≥ 1 hold only bucket-crossers, so the CSR side shrinks to their live
    * buckets instead of re-shipping the whole adjacency per outer round
    * (round 0 prunes too when the start frontier is already small). The
    * live set (≤ nBuckets ids) is collected and pushed as a LITERAL
    * IN-set: (1) the bucket key must use the kernel's exact Long division
    * — floor(col/lit) is a DOUBLE division that can round ids above 2^53
    * into the adjacent bucket and silently strand its walkers; (2) a
    * frontier-derived JOIN here would feed frontier stats back into the
    * round's plan and square sizeInBytes per round (see truncateReal).
    * When the live set spans most buckets the prune buys nothing — None
    * keeps the unfiltered cached side (and its cross-round shuffle-stage
    * reuse). Returns the pruned (bucket, v, adj) DataFrame; callers
    * re-type it per kernel. */
  private def prunedAdjRound(
      adjDf: DataFrame, liveBuckets: => Array[Long],
      engage: Boolean, nBuckets: Int): Option[DataFrame] =
    if (!engage) None
    else {
      val live = liveBuckets
      if (live.length < nBuckets / 2) Some(adjDf.filter(col("bucket").isin(live: _*)))
      else None
    }

  // ------------------------------------------------ chained step kernels
  // One function per walk family, shared verbatim by the cogroup kernel
  // and the driver tail — bitwise parity between the two execution paths
  // is by construction, not by parallel maintenance. All randomness keys
  // on (seed, walkerId, step, salt) only.

  /** One chained first-order step: next vertex, or -1 to terminate
    * (keep-draw failed). Salts: 1 keep, 2 alias index, 3 alias accept. */
  private def firstOrderStepKernel(
      a: graft.model.AdjRow, walkerId: Long, step: Int,
      keepProb: Double, seed: Long): Long =
    if (keepProb < 1.0 && jvmRand(seed, walkerId, step, 1) >= keepProb) -1L
    else {
      val n = a.nbrs.length
      val i = math.min((jvmRand(seed, walkerId, step, 2) * n).toInt, n - 1)
      if (jvmRand(seed, walkerId, step, 3) < a.prob(i)) a.nbrs(i)
      else a.nbrs(a.alias(i))
    }

  /** One chained node2vec step: first step (prev < 0) is a static alias
    * draw (salts 2, 3); later steps the exact biased inverse-CDF over
    * 1/p · 1 · 1/q weights (salt 4; same math as node2vecSample). */
  private def node2vecStepKernel(
      a: graft.model.AdjRow, walkerId: Long, step: Int,
      prev: Long, prevNbrs: Array[Long], p: Double, q: Double, seed: Long): Long =
    if (prev < 0) {
      val n = a.nbrs.length
      val i = math.min((jvmRand(seed, walkerId, step, 2) * n).toInt, n - 1)
      if (jvmRand(seed, walkerId, step, 3) < a.prob(i)) a.nbrs(i)
      else a.nbrs(a.alias(i))
    } else {
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

  /** One chained metapath step: masked inverse-CDF over the scheme's
    * allowed sub-adjacency (salt 5); -1 terminates (no allowed mass). */
  private def metapathStepKernel(
      a: graft.model.TypedAdjRow, walkerId: Long, step: Int,
      scheme: Array[Array[Boolean]], seed: Long): Long = {
    val mask = scheme(step % scheme.length)
    val n = a.nbrs.length
    var total = 0.0
    var i = 0
    while (i < n) {
      val et = a.etypes(i)
      if (et >= 0 && et < mask.length && mask(et)) total += a.wts(i)
      i += 1
    }
    if (total <= 0.0) -1L
    else {
      val dart = jvmRand(seed, walkerId, step, 5) * total
      var cum = 0.0
      var sel = -1
      var lastAllowed = -1
      i = 0
      while (i < n && sel < 0) {
        val et = a.etypes(i)
        if (et >= 0 && et < mask.length && mask(et)) {
          lastAllowed = i
          cum += a.wts(i)
          if (cum > dart) sel = i
        }
        i += 1
      }
      if (sel < 0) sel = lastAllowed // fp round-off: last allowed
      a.nbrs(sel)
    }
  }

  /** One chained generic-stateful step — exact mirror of genericStateful's
    * per-step kernel: Pe(step, state, curV), then the filtered inverse-CDF
    * over static·bias > 0 candidates in neighbour order. Returns
    * (nextV, newState); nextV = -1 terminates (keep-draw failed or zero
    * total mass), state unchanged in that case. */
  private def statefulStepKernel[S](
      a: graft.model.EdataAdjRow, walkerId: Long, step: Int, state: S,
      cfg: StatefulConfig[S], unbiased: Boolean,
      rnd: (Long, Int, String, Long) => Double, sampleSalt: String): (Long, S) = {
    val pe = cfg.extension(step, state, a.v)
    if (pe < 1.0 && rnd(walkerId, step, "keep", 1L) >= pe) (-1L, state)
    else {
      val n = a.nbrs.length
      val an = new scala.collection.mutable.ArrayBuffer[Long](n)
      val aw = new scala.collection.mutable.ArrayBuffer[Double](n)
      var i = 0
      while (i < n) {
        val s0 = if (unbiased) 1.0 else a.wts(i)
        val bw = s0 * cfg.bias(step, state, a.v, a.nbrs(i), a.wts(i), a.edatas(i))
        if (bw > 0.0) { an += a.nbrs(i); aw += bw }
        i += 1
      }
      var total = 0.0
      var t = 0
      while (t < aw.size) { total += aw(t); t += 1 }
      if (an.isEmpty || total <= 0.0) (-1L, state)
      else {
        val dart = rnd(walkerId, step, sampleSalt, 2L) * total
        var cum = 0.0
        var j = 0
        while (j < an.size - 1 && { cum += aw(j); cum <= dart }) j += 1
        val nxt = an(j)
        (nxt, cfg.update(state, walkerId, a.v, nxt))
      }
    }
  }

  /** Plan truncation with REAL statistics for the chained-walk rounds:
    * persist+count makes the leaf's stats the InMemoryRelation's actual
    * bytes, localCheckpoint then cuts the lineage inheriting them, and
    * the cache is dropped. Plain localCheckpoint copies the ESTIMATED
    * stats of the replaced plan — any frontier-derived join inside the
    * round (the node2vecChained prevNbrs resolution join) would square
    * sizeInBytes every round until Catalyst drowns in BigInteger
    * arithmetic (minutes per round by ~25; see Iterate's scaladoc). */
  private def truncateReal[T](ds: Dataset[T]): Dataset[T] = truncateRealCounted(ds)._1

  /** [[truncateReal]] that also returns the row count — the count is a
    * mandatory part of the real-stats protocol anyway, and every chained
    * round needs it for the loop condition; returning it saves one job
    * per round over a separate `frontier.count()`. */
  private def truncateRealCounted[T](ds: Dataset[T]): (Dataset[T], Long) = {
    val ser = StorageLevel.MEMORY_AND_DISK_SER
    val cached = ds.persist(ser)
    val n = cached.count()
    val cut = cached.localCheckpoint(true, ser)
    cached.unpersist(false)
    (cut, n)
  }

  /** Seal a chained walk: materialize the footprint-history union into ONE
    * lineage-cut copy and release the per-round output caches.
    *
    * r3 shape: every round `truncateReal`-ed its ENTIRE kernel output
    * (footprints + crossers — 9.2M rows/round at the scaling corpus) even
    * though only the small crosser frontier feeds the next round; the
    * count + eager-checkpoint-copy barriers on the full output dominated
    * the chained phase's scaling (BENCH r3: deepwalk_chained efficiency
    * 0.533 with cpu-sec flat ⇒ the cost WAS the barriers). r4 shape: the
    * round output stays lazily in its serialized cache (computed exactly
    * once, by the round's single crosser-count action), only the crosser
    * frontier gets real-stats truncation, and the footprints are copied
    * out exactly once here. The reference's chained engine likewise never
    * materializes per-round paths (include/path.hpp:164-477 assembles
    * once, at the end).
    *
    * Stats: the union's estimated sizeInBytes is the sum of the rounds'
    * REAL cached-batch sizes, and nothing iterates on the sealed result —
    * the stats-squaring pathology truncateReal guards against cannot
    * arise here, so a plain eager localCheckpoint (one copy, one action)
    * suffices. */
  private def sealChained(
      history: Seq[DataFrame], roundCaches: Seq[DataFrame]): DataFrame = {
    val result = history.reduce(_ unionAll _)
      .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
    roundCaches.foreach(_.unpersist(false))
    result
  }

  /** Light-mode frontier materialization: collect the tiny alive frontier
    * ONCE and serve both the IN-set CSR prune and the broadcast join side
    * from the same local rows. The keep/extension filter producing
    * `alive` is deterministic hash-rand today, so evaluating it twice
    * (once for the IN-set collect, once for the join) happened to agree —
    * but nothing enforced that, and a future nondeterministic Pe would
    * make the pruned CSR disagree with the joined rows and silently
    * strand or phantom-advance walkers (ADVICE r3). One collect job on
    * ≤ [[LightModeThreshold]] rows replaces the IN-set collect, so this
    * is also one job cheaper per tail step. */
  private def lightFrontier(alive: DataFrame): DataFrame = {
    val rows = alive.collect()
    alive.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), alive.schema)
  }

  /** Light-mode CSR pruning: collect the (≤ [[LightModeThreshold]])
    * distinct frontier vertices and push them into the adjacency scan as
    * an IN-set predicate. The persisted CSR is sorted within partitions
    * by v, so InMemoryTableScan prunes whole cached batches from their
    * (min, max) stats — a tail step reads o(|CSR|) rows instead of
    * scanning the full adjacency for a handful of walkers. */
  private def pruneAdjToFrontier(
      adj: DataFrame, frontier: DataFrame, vCol: String, fCol: String): DataFrame = {
    val vs = frontier.select(col(fCol)).filter(col(fCol).isNotNull)
      .distinct().collect().map(_.getLong(0))
    if (vs.isEmpty) adj.filter(lit(false)) else adj.filter(col(vCol).isin(vs: _*))
  }

  /** Durable-run parameter manifest: written next to the run's
    * checkpoints on first use; a resume with different walk parameters
    * fails loudly instead of silently continuing the old walk's prefix
    * (randomness keys on (seed, walkerId, step), so only identical
    * params make a resumed walk bitwise-identical). User-supplied
    * lambdas (generic configs) cannot be fingerprinted — engine params
    * and the start-set fingerprint are; keeping custom Pd functions
    * stable across resumes is the caller's contract. */
  private def checkManifest(
      store: graft.engine.Iterate.CheckpointStore,
      runName: String,
      spark: org.apache.spark.sql.SparkSession,
      params: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"${store.root}/$runName/_params")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) {
      val in = fs.open(p)
      val existing = new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      in.close()
      require(existing == params,
        s"resume '$runName': stored params [$existing] != requested [$params] — " +
          "use a fresh store/runName or matching parameters")
    } else {
      val out = fs.create(p, true)
      out.write(params.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      out.close()
    }
  }

  /** Shared durable-run scaffolding for the five walk engines (generic /
    * generic2 / firstOrder / node2vec / metapath): manifest check,
    * per-step truncate (store append or localCheckpoint), and resume —
    * reload stored steps 0..min(hi, maxSteps) into the footprint history
    * and continue from the highest (a store holding MORE steps than this
    * run's maxSteps is truncated: footprints beyond the requested horizon
    * must not leak into the result). Randomness keys on (seed, walkerId,
    * step), so identical params ⇒ a resumed walk is bitwise-identical to
    * an uninterrupted one (WalkResumeSpec). `params` is by-name: the
    * fingerprint job only runs for durable walks. */
  private final class DurableRun(
      spark: org.apache.spark.sql.SparkSession,
      store: Option[graft.engine.Iterate.CheckpointStore],
      runName: String, maxSteps: Int, params: => String) {
    store.foreach(s => checkManifest(s, runName, spark, params))

    def truncate(df: DataFrame, step: Int): DataFrame = store match {
      case Some(s) => s.save(runName, step, df)
      case None => df.localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
    }

    private val resumed: Seq[(Int, DataFrame)] = store match {
      case Some(s) => s.latest(runName) match {
        case Some((hi, _)) =>
          (0 to math.min(hi, maxSteps)).map(i =>
            (i, spark.read.parquet(s.iterPath(runName, i))))
        case None => Seq.empty
      }
      case None => Seq.empty
    }

    /** Append the resumed steps (or the truncated fresh step-0 frontier)
      * to `history` and return the (frontier, step) to continue from. */
    def seed(history: scala.collection.mutable.ArrayBuffer[DataFrame],
        fresh: => DataFrame): (DataFrame, Int) =
      if (resumed.nonEmpty) {
        resumed.foreach { case (_, df) => history += df }
        val (hi, f) = resumed.last
        System.err.println(s"[graft:$runName] resumed at step=$hi")
        (f, hi)
      } else {
        val f = truncate(fresh, 0)
        history += f
        (f, 0)
      }

    /** [[truncate]] that also returns the step's row count, carried by a
      * CollectMetrics node riding the truncation action itself (the
      * checkpoint / store write) — one Spark job per step instead of the
      * former truncate-then-count pair (r6; the chained kernels'
      * truncateRealCounted makes the same trade). */
    def truncateCounted(df: DataFrame, step: Int): (DataFrame, Long) = {
      val obs = org.apache.spark.sql.Observation()
      val out = truncate(df.observe(obs, count(lit(1)).as("n")), step)
      (out, obs.get("n").asInstanceOf[Long])
    }
  }

  /** Durable-run scaffolding for the CHAINED kernels (the join engines
    * use [[DurableRun]]): the durable unit is the outer ROUND — the full
    * kernel output (footprints + crossers, `moved`-flagged) goes to the
    * store as one lineage-tracked Parquet iteration, and round 0 encodes
    * the start frontier (rows that are simultaneously the step-0
    * footprints and the first frontier, all moved=true). A killed run
    * resumes from the last _SUCCESS-complete round: reload the footprint
    * history, re-derive the crosser frontier from the last round,
    * continue the loop. Randomness keys on (seed, walkerId, step) and
    * footprints are invariant to WHERE bucket crossings fall, so a
    * resumed run is bitwise-identical to an uninterrupted one even under
    * a different bucket count or tail threshold; maxSteps, however,
    * shapes the SAVED ROUND CONTENTS (walkers stop chaining at the
    * horizon and emit no crosser), so it is pinned by the manifest —
    * resuming a chained store to a different horizon fails loudly where
    * the join engines can truncate. Reference analogue: the per-epoch
    * path flush is engine-generic (include/walk.hpp:703-844). */
  private final class DurableChainedRun(
      spark: org.apache.spark.sql.SparkSession,
      store: Option[graft.engine.Iterate.CheckpointStore],
      runName: String, params: => String) {
    store.foreach(s => checkManifest(s, runName, spark, params))

    val durable: Boolean = store.isDefined

    /** Durable: write the round's Parquet (the write IS the round's
      * single heavy action; lineage rows ride it) and hand back the
      * read-back — a lineage-cut scan with real file stats, so the
      * non-durable path's in-memory truncation protocol applies
      * unchanged on top. Non-durable: serialized persist registered in
      * `roundCaches` (the crosser count materializes it). */
    def commitRound(round: Int, out: DataFrame,
        roundCaches: scala.collection.mutable.ArrayBuffer[DataFrame]): DataFrame =
      store match {
        case Some(s) => s.save(runName, round, out)
        case None =>
          val outP = out.persist(StorageLevel.MEMORY_AND_DISK_SER)
          roundCaches += outP
          outP
      }

    /** All complete rounds 0..hi of a resumable run, or None for a fresh
      * (or non-durable) run. */
    def resume(): Option[(Seq[DataFrame], Int)] = store.flatMap(s =>
      s.latest(runName).map { case (hi, _) =>
        System.err.println(s"[graft:$runName] resumed at round=$hi")
        ((0 to hi).map(r => spark.read.parquet(s.iterPath(runName, r))), hi)
      })
  }

  /** Cheap deterministic fingerprint of a starts table for the manifest
    * (order-insensitive sum of per-row hashes, folded below 2^31 so the
    * sum can't overflow under ANSI arithmetic). */
  private def startsFingerprint(starts: DataFrame): Long =
    // coalesce: sum() over zero rows is null — an empty starts table
    // fingerprints as 0 rather than NPEing before the (empty) walk runs
    starts.agg(coalesce(
        sum(pmod(xxhash64(col("walkerId"), col("curV")), lit(1000000007L))),
        lit(0L)))
      .head().getLong(0)

  /** Manifest rendering of an [[Extension]]: PerVertex carries a
    * DataFrame whose toString renders only its SCHEMA — resuming a
    * durable walk with a *different* Pe table of the same shape would
    * pass the manifest check and silently continue the old walk's prefix
    * (ADVICE r3). Fingerprint the table CONTENT the same way
    * [[startsFingerprint]] does; evaluated lazily (params is by-name),
    * so the job only runs for durable runs. */
  private def extensionFingerprint(ext: Extension): String = ext match {
    case Extension.PerVertex(pe) =>
      val fp = pe.agg(coalesce(
          sum(pmod(xxhash64(col("v"), col("pe")), lit(1000000007L))), lit(0L)))
        .head().getLong(0)
      s"PerVertex(fp=$fp)"
    case other => other.toString
  }

  // ------------------------------------------ start-distribution index

  /** Dense vertex-rank index cache: the index behind equalStarts /
    * uniformStarts / personalizedStarts is input-derived and identical
    * across calls; r2 rebuilt it (plus two counts) on every call. Keyed
    * by the canonicalized source plan; entries persist until
    * [[clearStartIndexCache]]. */
  private val startIdxCache =
    new java.util.concurrent.ConcurrentHashMap[
      (org.apache.spark.sql.SparkSession,
       org.apache.spark.sql.catalyst.plans.logical.LogicalPlan), (DataFrame, Long)]()

  private def denseIndexOf(verts: DataFrame): (DataFrame, Long) = {
    val spark = verts.sparkSession
    // full canonicalized plan under structural equality, not the 32-bit
    // semanticHash — a collision must not serve another table's index
    // (see GraphOps.adjCache)
    val key = (spark, verts.queryExecution.analyzed.canonicalized)
    startIdxCache.computeIfAbsent(key, _ => {
      val indexed = graft.derive.Derive.withDenseVid(
          verts.withColumnRenamed("v", "conv_id").withColumn("turn_idx", lit(0)))
        .select(col("conv_id").as("v"), col("vid").as("idx"))
        .persist(StorageLevel.MEMORY_AND_DISK_SER)
      (indexed, indexed.count())
    })
  }

  def clearStartIndexCache(): Unit = {
    startIdxCache.values.forEach(v => v._1.unpersist(false))
    startIdxCache.clear()
  }

  /** Release EVERY session-lifetime cache the walk engines populate (CSR,
    * bucketed CSR, start-vertex index) in one call — Bench/Scaling used
    * to have to remember both clears (ADVICE r3 hygiene). */
  def releaseCaches(): Unit = {
    graft.graph.GraphOps.clearAdjacencyCache()
    clearStartIndexCache()
  }

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
    // session-cached CSR: v-partitioned (heavy-mode frontier joins
    // co-locate on it) and sorted within partitions (light-mode IN-set
    // predicates prune cached batches via tight min/max stats)
    val adj = GraphOps.adjacencyCached(edges)

    def asFp(f: DataFrame) =
      f.select(col("walkerId"), col("step"), col("curV").as("vertex"))

    val run = new DurableRun(spark, store, runName, maxSteps,
      s"firstOrder seed=$seed keepProb=$keepProb portable=$portableRng " +
        s"startsFp=${startsFingerprint(starts)}")
    val history = scala.collection.mutable.ArrayBuffer[DataFrame]()
    var (frontier, step) = run.seed(history,
      starts.select(col("walkerId"), lit(0).as("step"), col("curV")))

    var active = frontier.count()
    while (active > 0 && step < maxSteps) {
      val alive =
        if (keepProb >= 1.0) frontier
        else frontier.filter(randSel(portableRng, seed, "keep") < keepProb)
      // light mode: a broadcast frontier joins the persisted adjacency in
      // place (no exchange) AND the adjacency scan itself is pruned to the
      // frontier's vertices (no full-CSR scan per tail step)
      val light = active < LightModeThreshold
      // light mode materializes `alive` once (lightFrontier) so the
      // IN-set prune and the join side cannot observe two different
      // evaluations of the random keep filter
      val aliveL = if (light) lightFrontier(alive) else alive
      // r6: mid-size frontiers broadcast too (no IN-set prune) — see
      // BroadcastFrontierThreshold
      val frontierSide =
        if (light || active < BroadcastFrontierThreshold) broadcast(aliveL) else aliveL
      val adjSide = if (light) pruneAdjToFrontier(adj, aliveL, "v", "curV") else adj
      val sampled =
        if (portableRng)
          inverseCdfSample(col("nbrs"), col("wts"), randP(seed, "s"))
        else
          graft.functions.AliasSampleExpr.sample(col("nbrs"), col("prob"), col("alias"),
            rand(seed, "a1"), rand(seed, "a2"))
      val advanced = frontierSide
        .join(adjSide, frontierSide("curV") === adjSide("v"))
        .select(col("walkerId"), (col("step") + 1).as("step"), sampled.as("curV"))
        .filter(col("curV").isNotNull)
      // plan truncation per step is safe with carried stats: the frontier
      // plan never self-joins, so stats grow linearly, not exponentially
      // (cf. Iterate)
      val (f2, n) = run.truncateCounted(advanced, step + 1)
      frontier = f2
      history += frontier
      step += 1
      active = n
      System.err.println(s"[graft:$runName] step=$step active=$active")
    }
    // adj is session-cached (GraphOps.adjacencyCached) — not unpersisted
    // here; release via GraphOps.clearAdjacencyCache
    history.map(asFp).reduce(_ unionAll _)
  }

  /** Explain-only replica of one heavy-mode [[firstOrder]] step (r06 plan
    * audit): frontier ⋈ session CSR + alias sample. Never executed. */
  def firstOrderStepPlanForExplain(edges: DataFrame): DataFrame = {
    val adj = GraphOps.adjacencyCached(edges)
    val frontier = equalStarts(edges, 20000L)
      .select(col("walkerId"), lit(0).as("step"), col("curV"))
    val sampled = graft.functions.AliasSampleExpr.sample(col("nbrs"), col("prob"),
      col("alias"), rand(42L, "a1"), rand(42L, "a2"))
    frontier.join(adj, frontier("curV") === adj("v"))
      .select(col("walkerId"), (col("step") + 1).as("step"), sampled.as("curV"))
      .filter(col("curV").isNotNull)
  }

  /** Explain-only replica of one heavy-mode [[node2vec]] step (r06 plan
    * audit). Never executed. */
  def node2vecStepPlanForExplain(edges: DataFrame): DataFrame = {
    val adj = GraphOps.adjacencyCached(edges)
    val nbrSets = adj.select(col("v").as("pv"), col("nbrs").as("prevNbrs"))
    val frontier = equalStarts(edges, 5000L)
      .select(col("walkerId"), lit(1).as("step"), col("curV"),
        col("curV").as("prevV"))
    val withAdj = frontier.join(adj, frontier("curV") === adj("v"))
    val withPrev = withAdj.join(nbrSets, withAdj("prevV") === nbrSets("pv"), "left")
    withPrev.select(
      col("walkerId"), (col("step") + 1).as("step"),
      node2vecSample(col("nbrs"), col("wts"), col("prevV"), col("prevNbrs"),
        lit(2.0), lit(0.5), rand(42L, "n2v")).as("curV"),
      col("curV").as("prevV"))
      .filter(col("curV").isNotNull)
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
      buckets: Int = 0,
      tailThreshold: Long = LightModeThreshold,
      store: Option[graft.engine.Iterate.CheckpointStore] = None,
      runName: String = "chain"): DataFrame = {
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
    val adjDf = GraphOps.bucketedAdjacencyCached(edges, rangeSize)
    def typed(df: DataFrame) = bucketKeyed[graft.model.AdjRow](df)
    val adjB = typed(adjDf)

    val run = new DurableChainedRun(spark, store, runName,
      s"firstOrderChained seed=$seed keep=$keepProb maxSteps=$maxSteps " +
        s"startsFp=${startsFingerprint(starts)}")
    val history = scala.collection.mutable.ArrayBuffer[DataFrame]()
    val roundCaches = scala.collection.mutable.ArrayBuffer[DataFrame]()
    var outer = 0
    var frontier: Dataset[(Long, Int, Long)] = run.resume() match {
      case Some((rounds, hi)) =>
        rounds.zipWithIndex.foreach { case (df, r) =>
          history += (if (r == 0) df else df.filter(!col("moved")))
            .select(col("walkerId"), col("step"), col("vertex"))
        }
        outer = hi
        rounds.last.filter(col("moved"))
          .select(col("walkerId"), col("step"), col("vertex").as("curV"))
          .as[(Long, Int, Long)]
      case None =>
        val f0 = starts.select(col("walkerId"), lit(0).as("step"), col("curV"))
          .as[(Long, Int, Long)]
          .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
        history += f0.toDF("walkerId", "step", "curV")
          .select(col("walkerId"), col("step"), col("curV").as("vertex"))
        if (run.durable)
          run.commitRound(0, f0.toDF("walkerId", "step", "curV")
            .select(col("walkerId"), col("step"), col("curV").as("vertex"),
              lit(true).as("moved")), roundCaches)
        f0
    }
    var active = frontier.count()
    try {
      while (active > 0 && outer <= maxSteps) {
        if (active <= tailThreshold) {
          // driver-local tail: finish the walk with vertex-pruned fetches
          // instead of paying a full-CSR cogroup exchange per round for a
          // handful of walkers (see chainedDriverTail)
          val foot = chainedDriverTail[(Long, Int, Long), graft.model.AdjRow,
              (Long, Int, Long)](
            frontier.collect(),
            neededOf = w => Seq(w._3),
            fetch = vs => fetchByVertex(adjDf, vs)(_.as[graft.model.AdjRow].collect()),
            fetchAll = lim =>
              fetchAllRows(adjDf, lim)(_.as[graft.model.AdjRow].collect()),
            vOf = _.v,
            degOf = _.nbrs.length,
            advance = { (w, look) =>
              val rows = scala.collection.mutable.ArrayBuffer[(Long, Int, Long)]()
              var (walkerId, step, cur) = w
              var parked: Option[(Long, Int, Long)] = None
              var done = false
              while (!done && step < maxSteps) {
                look(cur) match {
                  case TailUnfetched => parked = Some((walkerId, step, cur)); done = true
                  case TailDangling => done = true
                  case TailHave(a) =>
                    val nxt = firstOrderStepKernel(a, walkerId, step, keepProb, seed)
                    if (nxt < 0) done = true
                    else { step += 1; cur = nxt; rows += ((walkerId, step, cur)) }
                }
              }
              (rows.toSeq, parked)
            },
            label = "chain")
          val footDf = spark.createDataset(foot).toDF("walkerId", "step", "vertex")
          history += (if (run.durable)
            run.commitRound(outer + 1, footDf.withColumn("moved", lit(false)),
                roundCaches)
              .select(col("walkerId"), col("step"), col("vertex"))
          else footDf)
          active = 0
        } else {
          val grouped = frontier.groupByKey(_._3 / rangeSize)
          // live-bucket CSR prune — see prunedAdjRound
          val adjRound = prunedAdjRound(adjDf, frontier.map(_._3 / rangeSize)
                .distinct().collect(),
              engage = outer >= 1 || active < BucketPruneThreshold, nBuckets)
            .map(typed).getOrElse(adjB)
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
                    val nxt = firstOrderStepKernel(a, walkerId, step, keepProb, seed)
                    if (nxt < 0) done = true
                    else {
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
          // r4 round shape (VERDICT r3 #1): cache the full kernel output,
          // real-stats-truncate ONLY the (small) crosser frontier — its count
          // is the round's single heavy action and computes the cogroup into
          // the cache as a side effect. Footprints stay cached, consumed
          // lazily by sealChained — no per-round full-output copy or count.
          // (Durable runs swap the cache for the round's Parquet write —
          // commitRound — and the same truncation protocol rides the
          // read-back scan.)
          val outP = run.commitRound(outer + 1, out, roundCaches)
          history += outP.filter(!col("moved"))
            .select(col("walkerId"), col("step"), col("vertex"))
          val (f2, n) = truncateRealCounted(outP.filter(col("moved"))
            .select(col("walkerId"), col("step"), col("vertex").as("curV"))
            .as[(Long, Int, Long)])
          frontier = f2
          outer += 1
          active = n
          System.err.println(s"[graft:chain] outer=$outer active=$active")
        }
      }
      sealChained(history.toSeq, roundCaches.toSeq)
    } catch {
      // a failed round (e.g. a user lambda throwing in a sibling engine's
      // pattern, or an executor loss) must not leave the per-round caches
      // pinned for the session (ADVICE r4)
      case e: Throwable =>
        roundCaches.foreach(_.unpersist(false))
        throw e
    }
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
      buckets: Int = 0,
      crosserCap: Int = CrosserNbrsCap,
      tailThreshold: Long = LightModeThreshold,
      store: Option[graft.engine.Iterate.CheckpointStore] = None,
      runName: String = "n2vchain"): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val nBuckets =
      if (buckets > 0) buckets else math.max(spark.sparkContext.defaultParallelism * 2, 4)
    val maxV = edges.agg(greatest(max("src"), max("dst"))).head().getLong(0)
    val rangeSize = math.max(1L, maxV / nBuckets + 1)

    // session-cached bucketed CSR (see firstOrderChained)
    val adjDf = GraphOps.bucketedAdjacencyCached(edges, rangeSize)
    def typed(df: DataFrame) = bucketKeyed[graft.model.AdjRow](df)
    val adjB = typed(adjDf)

    val run = new DurableChainedRun(spark, store, runName,
      s"node2vecChained seed=$seed p=$p q=$q maxSteps=$maxSteps " +
        s"startsFp=${startsFingerprint(starts)}")
    val history = scala.collection.mutable.ArrayBuffer[DataFrame]()
    val roundCaches = scala.collection.mutable.ArrayBuffer[DataFrame]()
    var outer = 0
    // number of crossers in the CURRENT frontier that were shipped
    // without their prevNbrs (hub cap) — carried out of the previous
    // round's count action as an Observation metric, so gating the
    // resolution join costs zero extra jobs (r3 ran a needs.count()
    // barrier every round even when no hub crosser existed)
    var cappedPrev = 0L
    // frontier: (walkerId, step, curV, prevV (-1 = first step), prevNbrs)
    var frontier: Dataset[(Long, Int, Long, Long, Array[Long])] = run.resume() match {
      case Some((rounds, hi)) =>
        rounds.zipWithIndex.foreach { case (df, r) =>
          history += (if (r == 0) df else df.filter(!col("moved")))
            .select(col("walkerId"), col("step"), col("vertex"))
        }
        outer = hi
        val f = rounds.last.filter(col("moved"))
          .select(col("walkerId"), col("step"), col("vertex").as("curV"),
            col("prevV"), col("prevNbrs"))
          .as[(Long, Int, Long, Long, Array[Long])]
        // the resolution gate's Observation count died with the killed
        // run — recompute it off the reloaded frontier (resume-time only)
        cappedPrev = f.filter(w => w._4 >= 0L && w._5.isEmpty).count()
        f
      case None =>
        val f0 = starts.select(col("walkerId"), lit(0).as("step"), col("curV"),
            lit(-1L).as("prevV"), lit(Array.empty[Long]).as("prevNbrs"))
          .as[(Long, Int, Long, Long, Array[Long])]
          .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
        history += f0.toDF("walkerId", "step", "curV", "prevV", "prevNbrs")
          .select(col("walkerId"), col("step"), col("curV").as("vertex"))
        if (run.durable)
          run.commitRound(0, f0.toDF("walkerId", "step", "curV", "prevV", "prevNbrs")
            .select(col("walkerId"), col("step"), col("curV").as("vertex"),
              col("prevV"), col("prevNbrs"), lit(true).as("moved")), roundCaches)
        f0
    }
    var active = frontier.count()
    try {
      while (active > 0 && outer <= maxSteps) {
        if (active <= tailThreshold) {
          // driver-local tail (see chainedDriverTail): capped crossers'
          // prevNbrs resolve against the same local fetch map — prevV's
          // adjacency joins the IN-set, no resolution join at all
          val foot = chainedDriverTail[(Long, Int, Long, Long, Array[Long]),
              graft.model.AdjRow, (Long, Int, Long)](
            frontier.collect(),
            neededOf = w =>
              if (w._4 >= 0L && w._5.isEmpty) Seq(w._3, w._4) else Seq(w._3),
            fetch = vs => fetchByVertex(adjDf, vs)(_.as[graft.model.AdjRow].collect()),
            fetchAll = lim =>
              fetchAllRows(adjDf, lim)(_.as[graft.model.AdjRow].collect()),
            vOf = _.v,
            degOf = _.nbrs.length,
            advance = { (w, look) =>
              val rows = scala.collection.mutable.ArrayBuffer[(Long, Int, Long)]()
              var (walkerId, step, cur, prev, prevNbrs) = w
              var parked: Option[(Long, Int, Long, Long, Array[Long])] = None
              var done = false
              // re-arm a capped crosser first: its prev vertex MUST be in
              // the CSR (the walker stepped out of it last round)
              if (prev >= 0L && prevNbrs.isEmpty) look(prev) match {
                case TailHave(a) => prevNbrs = a.nbrs
                case TailUnfetched => parked = Some(w); done = true
                case TailDangling => done = true // unreachable: prev had out-edges
              }
              while (!done && step < maxSteps) {
                look(cur) match {
                  case TailUnfetched =>
                    parked = Some((walkerId, step, cur, prev, prevNbrs)); done = true
                  case TailDangling => done = true
                  case TailHave(a) =>
                    val nxt = node2vecStepKernel(a, walkerId, step, prev, prevNbrs,
                      p, q, seed)
                    prev = cur
                    prevNbrs = a.nbrs
                    step += 1
                    cur = nxt
                    rows += ((walkerId, step, cur))
                }
              }
              (rows.toSeq, parked)
            },
            label = "n2vchain")
          val footDf = spark.createDataset(foot).toDF("walkerId", "step", "vertex")
          history += (if (run.durable)
            run.commitRound(outer + 1, footDf
                .withColumn("prevV", lit(-1L))
                .withColumn("prevNbrs", lit(Array.empty[Long]))
                .withColumn("moved", lit(false)), roundCaches)
              .select(col("walkerId"), col("step"), col("vertex"))
          else footDf)
          active = 0
        } else {
          // crossers whose previous vertex had degree > crosserCap were
          // shipped WITHOUT their prevNbrs array (empty + prevV >= 0): re-
          // attach it here with one broadcast-frontier lookup join against
          // the persisted CSR — the hub arrays ride straight into the
          // cogroup exchange and never hit the per-round checkpoint. The
          // CSR side is pruned to the needed prev VERTICES (a literal
          // IN-set off the checkpointed frontier — one collect serves the
          // vertex set, its buckets, and the log; batch min/max stats on
          // the sorted top-level v cut below bucket granularity). r3
          // scanned the FULL cached adjacency per outer round to re-arm a
          // handful of hub crossers — a fixed cost that erases the
          // chaining win at scale. The reference ships state in
          // O(crossers) messages only (include/walk.hpp:273-363).
          val stepInput =
            if (cappedPrev == 0L) frontier
            else {
              val needs = frontier.filter(w => w._4 >= 0L && w._5.isEmpty)
              val ready = frontier.filter(w => w._4 < 0L || w._5.nonEmpty)
              // one collect off the small checkpointed frontier serves the
              // prev-vertex IN-set, its bucket IN-set, and the log; when
              // the capped set is huge (pathological all-hub frontier)
              // fall back to bucket granularity — a 100k-literal predicate
              // would cost more to plan than it prunes
              val prevVs = needs.map(_._4).distinct().collect().toSeq
              val needBuckets = prevVs.map(_ / rangeSize).distinct
              logResolution((needBuckets.length, nBuckets))
              System.err.println(
                s"[graft:n2vchain] resolving $cappedPrev capped crossers from " +
                  s"${prevVs.length} vertices in ${needBuckets.length}/$nBuckets CSR buckets")
              val csrSide = adjDf.filter(col("bucket").isin(needBuckets: _*))
              val csrPruned =
                if (prevVs.length <= LightModeThreshold)
                  // row-level prune on the sorted top-level v (evaluated as
                  // an InSet row filter; the bucket IN-set above already
                  // bounds the batches decompressed)
                  csrSide.filter(col("v").isin(prevVs: _*))
                else csrSide
              val resolved = csrPruned
                .select(col("v").as("pv"), col("adj.nbrs").as("pnbrs"))
                .join(broadcast(needs.toDF("walkerId", "step", "curV", "prevV", "prevNbrs")
                  .drop("prevNbrs")), col("prevV") === col("pv"))
                .select(col("walkerId"), col("step"), col("curV"), col("prevV"),
                  col("pnbrs").as("prevNbrs"))
                .as[(Long, Int, Long, Long, Array[Long])]
              ready.union(resolved)
            }
          val grouped = stepInput.groupByKey(_._3 / rangeSize)
          // live-bucket CSR prune — see prunedAdjRound
          val adjRound = prunedAdjRound(adjDf, frontier.map(_._3 / rangeSize)
                .distinct().collect(),
              engage = outer >= 1 || active < BucketPruneThreshold, nBuckets)
            .map(typed).getOrElse(adjB)
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
                    val nxt = node2vecStepKernel(a, walkerId, step, prev, prevNbrs,
                      p, q, seed)
                    prev = cur
                    prevNbrs = a.nbrs
                    step += 1
                    cur = nxt
                    // footprints carry no arrays — only crossers ship prevNbrs
                    rows += ((walkerId, step, cur, -1L, Array.empty[Long], false))
                }
              }
              if (!done && step < maxSteps && cur / rangeSize != bucket) {
                // bounded crosser state: hub-degree prevNbrs are NOT shipped
                // (re-resolved at the start of the next round instead)
                val ship = if (prevNbrs.length > crosserCap) Array.empty[Long] else prevNbrs
                rows += ((walkerId, step, cur, prev, ship, true))
              }
              rows
            }
          }.toDF("walkerId", "step", "vertex", "prevV", "prevNbrs", "moved")
          // r4 round shape (see firstOrderChained/sealChained): cache the
          // full output, real-stats-truncate ONLY the crosser frontier.
          // REAL stats on the frontier are mandatory here: the prevNbrs
          // resolution join feeds frontier-derived stats into the round's
          // plan, which would square without the truncation. The capped-
          // crosser count for the next round's resolution gate rides the
          // same count action as an Observation metric. (Durable runs
          // swap the cache for the round's Parquet write — commitRound.)
          val outP = run.commitRound(outer + 1, out, roundCaches)
          history += outP.filter(!col("moved"))
            .select(col("walkerId"), col("step"), col("vertex"))
          val obs = org.apache.spark.sql.Observation()
          val (f2, n) = truncateRealCounted(outP.filter(col("moved"))
            .select(col("walkerId"), col("step"), col("vertex").as("curV"),
              col("prevV"), col("prevNbrs"))
            .observe(obs, count(when(col("prevV") >= 0 && size(col("prevNbrs")) === 0,
              lit(1))).as("capped"))
            .as[(Long, Int, Long, Long, Array[Long])])
          frontier = f2
          cappedPrev = obs.get("capped").asInstanceOf[Long]
          outer += 1
          active = n
          System.err.println(
            s"[graft:n2vchain] outer=$outer active=$active capped=$cappedPrev")
        }
      }
      sealChained(history.toSeq, roundCaches.toSeq)
    } catch {
      case e: Throwable =>
        roundCaches.foreach(_.unpersist(false))
        throw e
    }
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
    val adj = GraphOps.adjacencyCached(edges)
    val nbrSets = adj.select(col("v").as("pv"), col("nbrs").as("prevNbrs"))

    // mid-walk resume: the per-step frontier snapshots carry prevV, so a
    // re-run with the same store continues the second-order walk exactly
    val run = new DurableRun(spark, store, runName, maxSteps,
      s"node2vec seed=$seed p=$p q=$q portable=$portableRng " +
        s"startsFp=${startsFingerprint(starts)}")
    val history = scala.collection.mutable.ArrayBuffer[DataFrame]()
    var (frontier, step) = run.seed(history, starts.select(
      col("walkerId"), lit(0).as("step"), col("curV"),
      lit(null).cast("long").as("prevV")))

    var active = frontier.count()
    while (active > 0 && step < maxSteps) {
      // light mode: broadcast the tail frontier and prune both CSR scans
      // (curV adjacency + prevV neighbour sets) to the frontier's vertices
      val light = active < LightModeThreshold
      // r6: mid-size frontiers broadcast without the IN-set prunes — see
      // BroadcastFrontierThreshold
      val frontSide =
        if (light || active < BroadcastFrontierThreshold) broadcast(frontier) else frontier
      val adjSide = if (light) pruneAdjToFrontier(adj, frontier, "v", "curV") else adj
      val nbrSide =
        if (light) broadcast(pruneAdjToFrontier(nbrSets, frontier, "pv", "prevV"))
        else nbrSets
      val withAdj = frontSide.join(adjSide, frontSide("curV") === adjSide("v"))
      val withPrev = withAdj
        .join(nbrSide, withAdj("prevV") === nbrSide("pv"), "left")
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
        .filter(col("curV").isNotNull)
      val (f2, n) = run.truncateCounted(advanced, step + 1)
      frontier = f2
      history += frontier
      step += 1
      active = n
      System.err.println(s"[graft:$runName] step=$step active=$active")
    }
    history.map(_.select(col("walkerId"), col("step"), col("curV").as("vertex")))
      .reduce(_ unionAll _)
  }

  /** One second-order rejection trial — the reference's dartboard
    * (include/walk.hpp:981-1014 outlier areas, :1033/:1226-1229
    * lower-bound pre-acceptance, :1126-1379 three-phase engine;
    * src/apps/node2vec.hpp:108-202 node2vec bounds: ub = max(1, 1/q),
    * lb = min(1/p, 1, 1/q), the return edge is the single outlier when
    * 1/p > ub). Returns (candidate, decided):
    *
    *  -  3  appendix-area hit — the outlier (return) edge's Pd is exactly
    *        1/p, so an appendix dart always accepts (T5)
    *  -  2  dart height ≤ lb — accepted WITHOUT evaluating Pd, i.e.
    *        without the prevV membership query (T4)
    *  -  1  known accept (candidate == prevV: Pd = min(1/p, ub) locally)
    *  - -1  known reject (same, dart above min(1/p, ub))
    *  -  0  needs the prevV-neighbourhood membership response (T6) —
    *        resolved by the caller's join; ONLY these rows join
    *  - None: no out-edges / zero static mass — walker terminates.
    *
    * Per trial P(propose c, accept) = w_c·Pd(c)/(ub·W + appendix), so
    * conditioned on acceptance the step follows the exact node2vec law —
    * the same distribution [[node2vecSample]] computes in closed form
    * (rejection never changes the law, only the query traffic). */
  private val node2vecProposeReject =
    udf { (nbrs: Seq[Long], wts: Seq[Double], prevV: java.lang.Long,
           p: Double, q: Double, rArea: Double, rDart: Double) =>
      val n = nbrs.size
      var total = 0.0
      var i = 0
      while (i < n) { total += wts(i); i += 1 }
      if (n == 0 || total <= 0.0) None
      else {
        val invP = 1.0 / p
        val invQ = 1.0 / q
        val ub = math.max(1.0, invQ)
        val lb = math.min(invP, math.min(1.0, invQ))
        val pv = if (prevV == null) -1L else prevV.longValue
        val retIdx =
          if (pv < 0) -1 else java.util.Arrays.binarySearch(nbrs.toArray, pv)
        val wRet = if (retIdx >= 0) wts(retIdx) else 0.0
        val aReg = ub * total
        val r0 = rArea * (aReg + math.max(0.0, invP - ub) * wRet)
        if (r0 >= aReg) Some((pv, 3))
        else {
          val dart = r0 / ub
          var cum = 0.0
          var j = 0
          while (j < n - 1 && { cum += wts(j); cum <= dart }) j += 1
          val c = nbrs(j)
          val u = rDart * ub
          if (u <= lb) Some((c, 2))
          else if (c == pv) Some((c, if (u <= math.min(invP, ub)) 1 else -1))
          else Some((c, 0))
        }
      }
    }

  /** Second-order node2vec walk via KnightKing-style REJECTION sampling —
    * the reference's actual sampling strategy (SURVEY.md §2.4 T4/T5), as
    * an alternative engine to the exact-distribution [[node2vec]]:
    * propose from the static weights (dartboard over ub·W plus the
    * return-edge outlier appendix), pre-accept below the Pd lower bound,
    * and send ONLY the undecided proposals through the prevV-membership
    * join (the reference's state query/response, T6). Rejected walkers
    * re-enter the frontier at the same position with `trial`+1 —
    * reference walk.hpp:1361-1364 re-emits rejected walkers to the same
    * vertex — so each outer iteration is one proposal per active walker,
    * exactly the reference super-step. Same law as [[node2vec]]
    * (frequency-matrix-tested), different traffic: per accepted step the
    * membership join sees (1 − lb/ub) of proposals instead of every
    * walker (paper Table 5a: −25% edges computed from lb alone).
    *
    * All draws key on (seed, walkerId, step, trial, salt), so the walk is
    * deterministic across parallelism levels and — with `portableRng` —
    * replayable draw-for-draw by the DuckDB oracle (q_node2vec_reject). */
  def node2vecReject(
      edges: DataFrame,
      starts: DataFrame,
      maxSteps: Int,
      p: Double = 1.0,
      q: Double = 1.0,
      seed: Long = 42L,
      portableRng: Boolean = false,
      runName: String = "n2vreject"): DataFrame = {
    require(1.0 / p > 0.0 && 1.0 / q > 0.0,
      s"rejection sampling needs positive dynamic factors (p=$p q=$q): " +
        "an infinite p or q gives some steps zero acceptance probability " +
        "(the exact-distribution node2vec engine handles those)")
    val adj = GraphOps.adjacencyCached(edges)
    val nbrSets = adj.select(col("v").as("pv"), col("nbrs").as("prevNbrs"))
    val invQ = 1.0 / q
    val ub = math.max(1.0, invQ)

    // per-(walker, step, TRIAL) draw — retries at the same position must
    // see fresh randomness (reference re-rolls per proposal)
    def randT(salt: String): Column =
      if (portableRng)
        graft.text.TextOps.h64(concat_ws(":", lit(seed), col("walkerId"),
            col("step"), col("trial"), lit(salt)))
          .cast("double") / lit(1152921504606846976.0) // 2^60
      else Synth.hashRand(lit(seed), col("walkerId"), col("step"),
        col("trial"), lit(salt))

    var frontier: DataFrame = truncateReal(starts.select(
      col("walkerId"), lit(0).as("step"), col("curV"),
      lit(null).cast("long").as("prevV"), lit(0).as("trial")))
    val history = scala.collection.mutable.ArrayBuffer[DataFrame]()
    val roundCaches = scala.collection.mutable.ArrayBuffer[DataFrame]()
    history += frontier.select(col("walkerId"), col("step"),
      col("curV").as("vertex"))

    try {
      var active = frontier.count()
      var iter = 0
      while (active > 0) {
        iter += 1
        val obs = org.apache.spark.sql.Observation()
        val light = active < LightModeThreshold
        val frontSide = if (light) broadcast(frontier) else frontier
        val adjSide =
          if (light) pruneAdjToFrontier(adj, frontier, "v", "curV") else adj
        val firstStep =
          if (portableRng) inverseCdfSample(col("nbrs"), col("wts"), randP(seed, "s"))
          else graft.functions.AliasSampleExpr.sample(col("nbrs"), col("prob"),
            col("alias"), rand(seed, "a1"), rand(seed, "a2"))
        val proposed = frontSide
          .join(adjSide, frontSide("curV") === adjSide("v"))
          .select(col("walkerId"), col("step"), col("curV"), col("prevV"),
            col("trial"),
            when(col("prevV").isNull,
                struct(firstStep.as("_1"), lit(1).as("_2")))
              .otherwise(node2vecProposeReject(col("nbrs"), col("wts"),
                col("prevV"), lit(p), lit(q), randT("area"), randT("dart")))
              .as("prop"),
            (randT("dart") * lit(ub)).as("u"))
          .select(col("walkerId"), col("step"), col("curV"), col("prevV"),
            col("trial"), col("prop._1").as("cand"),
            col("prop._2").as("decided"), col("u"))
          .filter(col("cand").isNotNull)
          .observe(obs,
            count(when(col("decided") === 2, lit(1))).as("preaccept"),
            count(when(col("decided") === 3, lit(1))).as("appendix"),
            count(when(col("decided") === 0, lit(1))).as("joined"))
          .persist(StorageLevel.MEMORY_AND_DISK_SER)
        // ONE action per iteration (the frontier truncation below): it
        // materializes `all`, whose cache build pulls `proposed` exactly
        // once (block locks dedupe the known/unknown legs), so the
        // observe fires once and nothing recomputes the draws. The
        // pre-r5t shape truncated `proposed` separately — two extra jobs
        // per iteration that dominated the wall at driver scale (240 s →
        // the per-trial engine is latency-bound, not work-bound, below
        // ~10M edges). Membership-join side gates on the KNOWN frontier
        // size (joined rows ⊆ frontier rows — no pre-action count).
        val known = proposed.filter(col("decided") =!= 0)
        val unknown = proposed.filter(col("decided") === 0)
        val nbrSide =
          if (light) broadcast(pruneAdjToFrontier(nbrSets, frontier, "pv", "prevV"))
          else nbrSets
        val resolved = unknown
          .join(nbrSide, unknown("prevV") === nbrSide("pv"), "left")
          .select(col("walkerId"), col("step"), col("curV"), col("prevV"),
            col("trial"), col("cand"),
            when(col("u") <=
                when(coalesce(array_contains(col("prevNbrs"), col("cand")),
                  lit(false)), lit(1.0)).otherwise(lit(invQ)),
              lit(1)).otherwise(lit(-1)).as("decided"),
            col("u"))
        val all = known.unionAll(resolved)
          .persist(StorageLevel.MEMORY_AND_DISK_SER)
        roundCaches += all
        val accepted = all.filter(col("decided") >= 1).select(
          col("walkerId"), (col("step") + 1).as("step"),
          col("cand").as("curV"), col("curV").as("prevV"),
          lit(0).as("trial"))
        history += accepted.select(col("walkerId"), col("step"),
          col("curV").as("vertex"))
        val rejected = all.filter(col("decided") === -1).select(
          col("walkerId"), col("step"), col("curV"), col("prevV"),
          (col("trial") + 1).as("trial"))
        val (f2, n) = truncateRealCounted(
          accepted.filter(col("step") < lit(maxSteps)).unionAll(rejected))
        proposed.unpersist(false)
        frontier = f2
        active = n
        val nPre = obs.get("preaccept").asInstanceOf[Long]
        val nApp = obs.get("appendix").asInstanceOf[Long]
        val nJoin = obs.get("joined").asInstanceOf[Long]
        logReject((nPre, nApp, nJoin))
        System.err.println(s"[graft:$runName] iter=$iter active=$active " +
          s"preaccept=$nPre appendix=$nApp joined=$nJoin")
      }
      sealChained(history.toSeq, roundCaches.toSeq)
    } catch {
      case e: Throwable =>
        roundCaches.foreach(_.unpersist(false))
        throw e
    }
  }

  /** Static-distribution proposal for the generic rejection engine:
    * inverse-CDF over the statics, returning BOTH the candidate and its
    * raw edge weight (the user Pd hook receives the weight — same
    * contract as [[dyn2SampleUdf]]). */
  private val staticProposeUdf =
    udf { (nbrs: Seq[Long], statics: Seq[Double], wts: Seq[Double], r: Double) =>
      val n = nbrs.size
      var total = 0.0
      var i = 0
      while (i < n) { total += statics(i); i += 1 }
      if (n == 0 || total <= 0.0) None
      else {
        val dart = r * total
        var cum = 0.0
        var j = 0
        while (j < n - 1 && { cum += statics(j); cum <= dart }) j += 1
        Some((nbrs(j), wts(j)))
      }
    }

  /** Membership-resolution verdict for [[generic2Reject]]: evaluate the
    * user Pd against the joined prevNbrs and accept iff the dart height
    * clears it. A Pd outside the user's declared bounds is a CONTRACT
    * violation that would silently skew the law (pre-accepted darts
    * assume lb ≤ Pd; the dartboard assumes Pd ≤ ub), so it fails loudly
    * on every evaluated candidate (pre-accepted rows are by definition
    * not evaluated — best-effort, like the reference, which trusts the
    * bounds entirely: include/walk.hpp:241-271). */
  private def resolveRejectUdf(
      f: (Int, Long, Seq[Long], Long, Double) => Double,
      upper: Double, lower: Double) =
    udf { (step: Int, prevV: Long, prevNbrs: Seq[Long], cand: Long,
           candW: Double, u: Double, cap: Double) =>
      val pd = f(step, prevV, prevNbrs, cand, candW)
      // cap encodes the row's regime: == upper → plain bounds (no
      // outliers declared); +∞ → regular proposal in outlier mode (an
      // overflowing Pd is legal there — the appendix supplies the excess
      // mass); finite > upper → appendix row, enforce the overflow
      // contract (Pd − ub)·Ps ≤ ovf, i.e. Pd ≤ cap = ub + ovf/Ps
      if (cap == upper)
        require(pd <= upper && pd >= lower,
          s"user Pd $pd outside declared bounds [$lower, $upper] " +
            s"(step=$step prevV=$prevV cand=$cand)")
      else if (cap.isPosInfinity)
        require(pd >= lower,
          s"user Pd $pd below declared lower bound $lower " +
            s"(step=$step prevV=$prevV cand=$cand)")
      else
        require(pd >= lower && pd <= cap + 1e-9,
          s"outlier overflow: Pd $pd exceeds upper $upper plus the " +
            s"declared overflow headroom (cap $cap, step=$step " +
            s"prevV=$prevV cand=$cand)")
      if (u <= pd) 1 else -1
    }

  /** Second-order proposal with the generic outlier appendix (reference
    * walk.hpp:1181-1208): one 'oarea' draw decides appendix vs regular.
    * Appendix proposals carry the ADJUSTED dart stripPos/Ps + ub
    * (:1202) and are ALWAYS undecided — the membership join evaluates
    * the user Pd against it, restoring the exact Ps·Pd law for edges
    * whose Pd overflows `upper`. A search miss consumes the trial as a
    * rejection. Returns (cand, candW, dart, decided, cap, kind). */
  private def propose2OutlierUdf(
      oc: OutlierConfig2, upper: Double, lower: Double) =
    udf { (step: Int, prevV: Long, curV: Long, nbrs: Seq[Long],
           wts: Seq[Double], statics: Seq[Double],
           rO: Double, rA: Double, rD: Double) =>
      val n = nbrs.size
      var total = 0.0
      var i = 0
      while (i < n) { total += statics(i); i += 1 }
      if (n == 0 || total <= 0.0) None
      else {
        val (ovf, num) = oc.bound(step, prevV, curV, nbrs, wts)
        val rv = if (ovf > 0.0 && num > 0)
          rO * (ovf * num + upper * total) - upper * total else -1.0
        if (rv > 0.0) {
          var idx = (rv / ovf).toInt
          if (idx >= num) idx = num - 1 // round-off guard (:1193-1197)
          val e = oc.search(step, prevV, curV, nbrs, wts, idx)
          if (e >= 0 && statics(e) > 0.0)
            Some((nbrs(e), wts(e), (rv - idx * ovf) / statics(e) + upper,
              0, upper + ovf / statics(e), 1))
          else Some((-1L, 0.0, 0.0, -1, upper, 1))
        } else {
          val dart = rA * total
          var cum = 0.0
          var j = 0
          while (j < n - 1 && { cum += statics(j); cum <= dart }) j += 1
          val u = rD * upper
          val dec = if (u <= lower) 2 else 0
          Some((nbrs(j), wts(j), u, dec, Double.PositiveInfinity, 0))
        }
      }
    }

  /** Second-order walk under a user [[SecondOrderConfig]] sampled by
    * REJECTION with user-declared dynamic bounds — the reference's
    * generic rejection surface (`dcomp_upperbound_func` /
    * `dcomp_lowerbound_func`, include/walk.hpp:241-271; pre-accept
    * :1033/:1226-1229): propose from the static distribution, darts ≤
    * `lower` accept WITHOUT resolving the previous vertex's neighbour
    * set, and only undecided proposals evaluate the user Pd against the
    * joined prevNbrs — the join sees (1 − lb/ub) of proposals instead of
    * every walker. [[node2vecReject]] is the specialized instance (plus
    * the return-edge outlier appendix, which needs Pd knowledge the
    * generic surface doesn't have). Same law as [[generic2]].
    *
    * Zero-dynamic-mass positions (every candidate's Pd = 0) reject
    * forever under pure rejection — the reference simply requires users
    * avoid them. Here a walker that rejects `maxTrials` times falls back
    * to ONE exact-distribution draw ([[dyn2SampleUdf]]) at its position:
    * each trial is independent, and both samplers draw the identical
    * accept-conditional law, so the fallback changes nothing
    * distributionally — it only bounds the iteration count
    * (≤ maxSteps·(maxTrials+1)) and gives zero-mass walkers the same
    * death [[generic2]] gives them.
    *
    * @param upper must dominate every Pd value the hook can return
    * @param lower must not exceed any Pd value (0 disables pre-accept)
    */
  def generic2Reject(
      edges: DataFrame,
      starts: DataFrame,
      maxSteps: Int,
      config: SecondOrderConfig,
      upper: Double,
      lower: Double = 0.0,
      maxTrials: Int = 64,
      seed: Long = 42L,
      portableRng: Boolean = false,
      outliers: Option[OutlierConfig2] = None,
      runName: String = "gwalk2rej"): DataFrame = {
    require(upper > 0 && lower >= 0 && lower <= upper,
      s"need 0 <= lower <= upper and upper > 0 (got lower=$lower upper=$upper)")
    require(maxTrials >= 1, s"maxTrials must be >= 1 (got $maxTrials)")
    val adj = GraphOps.adjacencyCached(edges)
      .withColumn("statics", config.static match {
        case StaticComp.EdgeWeight => col("wts")
        case StaticComp.Unbiased => transform(col("wts"), _ => lit(1.0))
      })
    val nbrSets = adj.select(col("v").as("pv"), col("nbrs").as("prevNbrs"))
    val dyn = dyn2SampleUdf(config.dynamic2)
    val resolve = resolveRejectUdf(config.dynamic2, upper, lower)

    // per-(walker, step, TRIAL) draw; portable mode uses the md5 stream
    // every oracle replays (same keying as node2vecReject's)
    def randT(salt: String): Column =
      if (portableRng)
        graft.text.TextOps.h64(concat_ws(":", lit(seed), col("walkerId"),
            col("step"), col("trial"), lit(salt)))
          .cast("double") / lit(1152921504606846976.0) // 2^60
      else Synth.hashRand(lit(seed), col("walkerId"), col("step"),
        col("trial"), lit(salt))

    var frontier: DataFrame = truncateReal(starts.select(
      col("walkerId"), lit(0).as("step"), col("curV"),
      lit(null).cast("long").as("prevV"), lit(0).as("trial")))
    val history = scala.collection.mutable.ArrayBuffer[DataFrame]()
    val roundCaches = scala.collection.mutable.ArrayBuffer[DataFrame]()
    history += frontier.select(col("walkerId"), col("step"),
      col("curV").as("vertex"))

    try {
      var active = frontier.count()
      var iter = 0
      var nEscal = 0L // walkers at maxTrials in the CURRENT frontier
      while (active > 0) {
        iter += 1
        val obs = org.apache.spark.sql.Observation()
        // Pe keys on (walkerId, step): deterministic, so re-testing a
        // rejected walker at the same position repeats the same draw —
        // one extension decision per position, like generic2
        val aliveRaw = applyExtension(frontier, config.extension, seed,
          portable = portableRng)
        val light = active < LightModeThreshold
        val aliveL = if (light) lightFrontier(aliveRaw) else aliveRaw
        val frontSide = if (light) broadcast(aliveL) else aliveL
        val adjSide =
          if (light) pruneAdjToFrontier(adj, aliveL, "v", "curV") else adj
        val normal = frontSide.filter(col("trial") < maxTrials)
        val escal = frontSide.filter(col("trial") >= maxTrials)
        val firstStep =
          inverseCdfSample(col("nbrs"), col("statics"),
            randSel(portableRng, seed, "s"))
        val joined0 = normal.join(adjSide, normal("curV") === adjSide("v"))
        val proposed = (outliers match {
          case None => joined0
            .select(col("walkerId"), col("step"), col("curV"), col("prevV"),
              col("trial"),
              when(col("prevV").isNull,
                  struct(firstStep.as("_1"), lit(0.0).as("_2")))
                .otherwise(staticProposeUdf(col("nbrs"), col("statics"),
                  col("wts"), randT("area"))).as("prop"),
              (randT("dart") * lit(upper)).as("u"))
            .select(col("walkerId"), col("step"), col("curV"), col("prevV"),
              col("trial"), col("prop._1").as("cand"),
              col("prop._2").as("candW"),
              when(col("prevV").isNull, lit(1))
                .when(col("u") <= lit(lower), lit(2))
                .otherwise(lit(0)).as("decided"),
              col("u"), lit(upper).as("cap"), lit(0).as("kind"))
          case Some(oc) =>
            val prop2 = propose2OutlierUdf(oc, upper, lower)
            joined0
              .select(col("walkerId"), col("step"), col("curV"),
                col("prevV"), col("trial"),
                when(col("prevV").isNull,
                    struct(firstStep.as("_1"), lit(0.0).as("_2"),
                      lit(0.0).as("_3"), lit(1).as("_4"),
                      lit(upper).as("_5"), lit(0).as("_6")))
                  .otherwise(prop2(col("step"), col("prevV"), col("curV"),
                    col("nbrs"), col("wts"), col("statics"),
                    randT("oarea"), randT("area"), randT("dart")))
                  .as("prop"))
              .select(col("walkerId"), col("step"), col("curV"),
                col("prevV"), col("trial"), col("prop._1").as("cand"),
                col("prop._2").as("candW"), col("prop._4").as("decided"),
                col("prop._3").as("u"), col("prop._5").as("cap"),
                col("prop._6").as("kind"))
        }).filter(col("cand").isNotNull)
          .observe(obs,
            count(when(col("decided") === 2, lit(1))).as("preaccept"),
            count(when(col("decided") === 0, lit(1))).as("joined"),
            count(when(col("kind") === 1, lit(1))).as("appendix"))
          .persist(StorageLevel.MEMORY_AND_DISK_SER)
        // ONE action per iteration (the frontier truncation below): it
        // materializes `all`, whose cache build materializes `proposed`
        // exactly once (block locks dedupe the known/unknown legs), so
        // the observe fires once and nothing recomputes the draws. The
        // r5-original shape truncated `proposed` separately — 2 extra
        // jobs per iteration that dominated the wall at driver scale.
        val known = proposed.filter(col("decided") =!= 0)
        val unknown = proposed.filter(col("decided") === 0)
        // membership-join side gated on the KNOWN frontier size (joined
        // rows ⊆ alive rows, so active < threshold implies the join side
        // is light too — no pre-action count needed); pruning keys off
        // the already-materialized frontier, not the lazy proposals
        val nbrSide =
          if (light) broadcast(pruneAdjToFrontier(nbrSets, aliveL, "pv", "prevV"))
          else nbrSets
        val resolved = unknown
          .join(nbrSide, unknown("prevV") === nbrSide("pv"), "left")
          .select(col("walkerId"), col("step"), col("curV"), col("prevV"),
            col("trial"), col("cand"), col("candW"),
            resolve(col("step"), col("prevV"), col("prevNbrs"), col("cand"),
              col("candW"), col("u"), col("cap")).as("decided"),
            col("u"), col("cap"), col("kind"))
        val all = known.unionAll(resolved)
          .persist(StorageLevel.MEMORY_AND_DISK_SER)
        roundCaches += all
        // escalated walkers: one exact-distribution draw at the position.
        // Rare by construction (maxTrials straight rejections), so the
        // two-join sub-plan is built ONLY when the previous frontier
        // truncation counted a row at maxTrials (nEscal tracks it).
        val accepted0 = all.filter(col("decided") >= 1).select(
          col("walkerId"), (col("step") + 1).as("step"),
          col("cand").as("curV"), col("curV").as("prevV"),
          lit(0).as("trial"))
        val accepted = if (nEscal == 0) accepted0 else {
          val exact = escal
            .join(adjSide, escal("curV") === adjSide("v"))
            .join(nbrSets, escal("prevV") === nbrSets("pv"), "left")
            .select(col("walkerId"), (col("step") + 1).as("step"),
              dyn(col("step"), col("prevV"), col("prevNbrs"), col("nbrs"),
                col("wts"), col("statics"), randT("exact")).as("curV"),
              escal("curV").as("prevV"), lit(0).as("trial"))
            .filter(col("curV").isNotNull)
            .persist(StorageLevel.MEMORY_AND_DISK_SER)
          roundCaches += exact
          accepted0.unionAll(exact)
        }
        history += accepted.select(col("walkerId"), col("step"),
          col("curV").as("vertex"))
        val rejected = all.filter(col("decided") === -1).select(
          col("walkerId"), col("step"), col("curV"), col("prevV"),
          (col("trial") + 1).as("trial"))
        val obsF = org.apache.spark.sql.Observation()
        val (f2, n) = truncateRealCounted(
          accepted.filter(col("step") < lit(maxSteps)).unionAll(rejected)
            .observe(obsF,
              count(when(col("trial") >= maxTrials, lit(1))).as("escal")))
        proposed.unpersist(false)
        frontier = f2
        active = n
        nEscal = obsF.get("escal").asInstanceOf[Long]
        val nPre = obs.get("preaccept").asInstanceOf[Long]
        val nApp = obs.get("appendix").asInstanceOf[Long]
        val nJoin = obs.get("joined").asInstanceOf[Long]
        logReject((nPre, nApp, nJoin))
        System.err.println(s"[graft:$runName] iter=$iter active=$active " +
          s"preaccept=$nPre appendix=$nApp joined=$nJoin escalNext=$nEscal")
      }
      sealChained(history.toSeq, roundCaches.toSeq)
    } catch {
      case e: Throwable =>
        roundCaches.foreach(_.unpersist(false))
        throw e
    }
  }

  /** Salt tables for [[rejectSampleUdf]]'s three draw streams (proposal
    * dart, accept draw, exact fallback) — numeric for the jvm splitmix
    * streams, strings for the md5 portable streams (the DuckDB oracle
    * interpolates the same literals). */
  private val RejectSaltsJ = Array(0xA1L, 0xA2L, 0xA3L, 0xA4L)
  private val RejectSaltsP = Array("ra", "ru", "rx", "ro")

  /** First-order rejection sampler: the reference's LOCAL rejection loop
    * (include/walk.hpp:1030-1040) inside one row — propose a candidate
    * from the static distribution, pre-accept darts ≤ lb without
    * evaluating Pd (:1033), otherwise evaluate the user Pd ONCE for the
    * candidate and accept iff the dart clears it; retry with fresh
    * (walker, step, trial)-keyed randomness. Unlike the second-order
    * case there is no remote state, so the whole retry loop stays in the
    * UDF — no extra engine iterations, no join: the win over the exact
    * [[dynSampleUdf]] is O(trials) Pd evaluations per step instead of
    * O(degree) (the paper's Table 5a "−25 % edges computed" is exactly
    * this at lb > 0). `maxTrials` straight rejections fall back to one
    * exact inverse-CDF draw over the full biased distribution —
    * distribution-neutral (independent trials; both samplers draw the
    * identical accept-conditional law), it bounds the loop and gives
    * zero-dynamic-mass positions the exact engine's death.
    *
    * Returns (dst, pdEvals, preAccepted, appendixTrials) for the
    * observe() counters. */
  private def rejectSampleUdf(
      f: (Int, Long, Long, Double) => Double,
      upper: Double, lower: Double, maxTrials: Int, portable: Boolean,
      outliers: Option[OutlierConfig]) =
    udf { (seed: Long, walkerId: Long, step: Int, curV: Long,
           nbrs: Seq[Long], wts: Seq[Double], statics: Seq[Double]) =>
      val n = nbrs.size
      var total = 0.0
      var i = 0
      while (i < n) { total += statics(i); i += 1 }
      if (n == 0 || total <= 0.0) None
      else {
        // (step, trial) → distinct rand stream keys per salt index
        // (0 = proposal dart, 1 = accept draw, 2 = exact fallback,
        // 3 = outlier area draw). jvm mode packs (step, trial) — both
        // far below 2^20; portable mode keys
        // md5("seed:walker:step:trial:salt") like every other portable
        // draw, so DuckDB replays the loop trial-for-trial.
        def r(trial: Int, saltIdx: Int): Double =
          if (portable)
            graft.text.TextOps.h64jvm(
              s"$seed:$walkerId:$step:$trial:${RejectSaltsP(saltIdx)}")
              .toDouble / 1152921504606846976.0 // 2^60
          else jvmRand(seed, walkerId,
            (step.toLong << 20) | trial.toLong, RejectSaltsJ(saltIdx))
        var trial = 0
        var evals = 0L
        var pre = 0L
        var app = 0L
        var dst = -1L
        while (dst < 0 && trial < maxTrials) {
          // T5 appendix (reference walk.hpp:981-1014): one area draw over
          // [0, ovf·num + upper·total) decides appendix vs regular; an
          // appendix hit consumes the trial whether it accepts or not.
          var regular = true
          if (outliers.nonEmpty) {
            val (ovf, num) = outliers.get.bound(step, curV, nbrs, wts)
            if (ovf > 0.0 && num > 0) {
              val rv = r(trial, 3) * (ovf * num + upper * total) - upper * total
              if (rv > 0.0) {
                regular = false
                app += 1L
                var idx = (rv / ovf).toInt
                if (idx >= num) idx = num - 1 // round-off guard (:993-997)
                val e = outliers.get.search(step, curV, nbrs, wts, idx)
                if (e >= 0 && statics(e) > 0.0) {
                  val ps = statics(e)
                  val pd = f(step, curV, nbrs(e), wts(e))
                  evals += 1L
                  require((pd - upper) * ps <= ovf + 1e-9,
                    s"outlier overflow (Pd $pd − upper $upper)·Ps $ps exceeds " +
                      s"declared bound $ovf (step=$step curV=$curV out=${nbrs(e)})")
                  if ((rv - idx * ovf) / ps + upper <= pd) dst = nbrs(e)
                }
              }
            }
          }
          if (regular) {
            val dart = r(trial, 0) * total
            var cum = 0.0
            var j = 0
            while (j < n - 1 && { cum += statics(j); cum <= dart }) j += 1
            val u = r(trial, 1) * upper
            if (u <= lower) { pre = 1L; dst = nbrs(j) }
            else {
              val pd = f(step, curV, nbrs(j), wts(j))
              // with outliers declared, a regular proposal may legally be
              // an overflowing outlier edge (it then always accepts, the
              // appendix supplying the excess mass) — only the lower
              // bound stays checkable here
              require(pd >= lower && (outliers.nonEmpty || pd <= upper),
                s"user Pd $pd outside declared bounds [$lower, $upper] " +
                  s"(step=$step curV=$curV cand=${nbrs(j)})")
              evals += 1L
              if (u <= pd) dst = nbrs(j)
            }
          }
          trial += 1
        }
        if (dst >= 0) Some((dst, evals, pre, app))
        else {
          // exact fallback: one inverse-CDF draw over Ps·Pd
          val bw = new Array[Double](n)
          var bt = 0.0
          var k = 0
          while (k < n) {
            bw(k) = statics(k) * f(step, curV, nbrs(k), wts(k))
            bt += bw(k)
            k += 1
          }
          evals += n.toLong
          if (bt <= 0.0) None
          else {
            val dart2 = r(maxTrials, 2) * bt
            var cum = 0.0
            var j = 0
            while (j < n - 1 && { cum += bw(j); cum <= dart2 }) j += 1
            Some((nbrs(j), evals, 0L, app))
          }
        }
      }
    }

  /** First-order walk under a user [[TransitionConfig]] sampled by
    * REJECTION with user-declared dynamic bounds — the first-order half
    * of the reference's `dcomp_upperbound_func`/`dcomp_lowerbound_func`
    * surface (include/walk.hpp:241-271, loop :1030-1040; [[generic2Reject]]
    * is the second-order half). Same law as [[generic]] with the same
    * config — rejection trades Pd evaluations for retries; RejectSpec
    * pins the frequency law and the evaluation-count ordering. With
    * `portableRng` every trial draw is md5-keyed, so an external engine
    * can replay the loop trial-for-trial (q_reject_generic's DuckDB
    * recursive CTE does, including the maxTrials fallback draw).
    * `outliers` adds the reference's T5 appendix ([[OutlierConfig]]) for
    * positions where Pd legitimately overflows `upper` on declared edges.
    *
    * @param upper must dominate every Pd value the hook can return —
    *              except on edges declared via `outliers`
    * @param lower must not exceed any Pd value (0 disables pre-accept) */
  def genericReject(
      edges: DataFrame,
      starts: DataFrame,
      maxSteps: Int,
      config: TransitionConfig,
      upper: Double,
      lower: Double = 0.0,
      maxTrials: Int = 64,
      seed: Long = 42L,
      portableRng: Boolean = false,
      outliers: Option[OutlierConfig] = None,
      store: Option[graft.engine.Iterate.CheckpointStore] = None,
      runName: String = "gwalkrej"): DataFrame = {
    require(config.dynamic.nonEmpty,
      "genericReject needs a dynamic component — use generic/firstOrder for static-only walks")
    require(upper > 0 && lower >= 0 && lower <= upper,
      s"need 0 <= lower <= upper and upper > 0 (got lower=$lower upper=$upper)")
    require(maxTrials >= 1, s"maxTrials must be >= 1 (got $maxTrials)")
    val adj = GraphOps.adjacencyCached(edges)
      .withColumn("statics", config.static match {
        case StaticComp.EdgeWeight => col("wts")
        case StaticComp.Unbiased => transform(col("wts"), _ => lit(1.0))
      })
    val sampler = rejectSampleUdf(
      config.dynamic.get, upper, lower, maxTrials, portableRng, outliers)

    // durable per-step snapshots + resume, like every join engine —
    // randomness keys on (seed, walkerId, step, trial), never on history,
    // so a resumed run is bitwise-identical (WalkResumeSpec); the in-row
    // retry loop makes the step the natural durable unit (no trial state
    // survives a step boundary)
    val run = new DurableRun(edges.sparkSession, store, runName, maxSteps,
      s"genericReject seed=$seed portable=$portableRng " +
        s"bounds=($lower,$upper) maxTrials=$maxTrials " +
        s"static=${config.static} outliers=${outliers.nonEmpty} " +
        s"ext=${extensionFingerprint(config.extension)} " +
        s"startsFp=${startsFingerprint(starts)}")
    val history = scala.collection.mutable.ArrayBuffer[DataFrame]()
    var (frontier, step) = run.seed(history,
      starts.select(col("walkerId"), lit(0).as("step"), col("curV")))
    var active = frontier.count()
    while (active > 0 && step < maxSteps) {
      val alive = applyExtension(frontier, config.extension, seed, portableRng)
      val light = active < LightModeThreshold
      val aliveL = if (light) lightFrontier(alive) else alive
      val side = if (light) broadcast(aliveL) else aliveL
      val adjSide = if (light) pruneAdjToFrontier(adj, aliveL, "v", "curV") else adj
      val obs = org.apache.spark.sql.Observation()
      val stepped = side.join(adjSide, side("curV") === adjSide("v"))
        .select(col("walkerId"), (col("step") + 1).as("step"),
          sampler(lit(seed), col("walkerId"), col("step"), col("curV"),
            col("nbrs"), col("wts"), col("statics")).as("prop"))
        .filter(col("prop").isNotNull)
        .select(col("walkerId"), col("step"), col("prop._1").as("curV"),
          col("prop._2").as("evals"), col("prop._3").as("pre"),
          col("prop._4").as("app"))
        .observe(obs, sum(col("evals")).as("evals"), sum(col("pre")).as("pre"),
          sum(col("app")).as("app"))
      frontier = run.truncate(
        stepped.select(col("walkerId"), col("step"), col("curV")), step + 1)
      history += frontier
      step += 1
      active = frontier.count()
      val nPre = Option(obs.get("pre")).collect { case l: Long => l }.getOrElse(0L)
      val nEv = Option(obs.get("evals")).collect { case l: Long => l }.getOrElse(0L)
      val nApp = Option(obs.get("app")).collect { case l: Long => l }.getOrElse(0L)
      // middle log slot: engine-specific counter (second-order engines:
      // membership joins; this first-order engine: appendix trials)
      logReject((nPre, nApp, nEv))
      System.err.println(s"[graft:$runName] step=$step active=$active " +
        s"preaccept=$nPre appendix=$nApp pdEvals=$nEv")
    }
    history.map(f => f.select(col("walkerId"), col("step"),
      col("curV").as("vertex"))).reduce(_ unionAll _)
  }

  /** Epoched [[genericReject]] — the walk-rate memory bound composed with
    * the rejection engine (reference include/walk.hpp:140-144; RNG keys
    * on the absolute walkerId, so epoched == single-run bitwise). */
  def genericRejectEpoched(
      edges: DataFrame,
      startsFor: (Long, Long) => DataFrame,
      numWalkers: Long,
      epochs: Int,
      maxSteps: Int,
      config: TransitionConfig,
      upper: Double,
      lower: Double = 0.0,
      maxTrials: Int = 64,
      seed: Long = 42L,
      portableRng: Boolean = false,
      outliers: Option[OutlierConfig] = None): DataFrame =
    epochedRun(edges.sparkSession, numWalkers, epochs) { case (begin, end) =>
      genericReject(edges, startsFor(begin, end), maxSteps, config,
        upper, lower, maxTrials, seed, portableRng, outliers)
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
      portableRng: Boolean = false,
      store: Option[graft.engine.Iterate.CheckpointStore] = None,
      runName: String = "meta"): DataFrame = {
    val spark = edges.sparkSession
    val adj = edges
      .groupBy(col("src").as("v"))
      .agg(sort_array(collect_list(struct(col("dst"), col("weight"), col("etype")))).as("adjl"))
      .select(col("v"),
        col("adjl.dst").as("nbrs"), col("adjl.weight").as("wts"), col("adjl.etype").as("etypes"))
      .repartition(col("v"))
      .sortWithinPartitions("v")
      .persist(StorageLevel.MEMORY_AND_DISK_SER)

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
          if (et >= 0 && et < mask.length && mask(et)) { an += nbrs(i); aw += wts(i) }
          i += 1
        }
        var total = 0.0
        var t = 0
        while (t < aw.size) { total += aw(t); t += 1 }
        if (an.isEmpty || total <= 0.0) None
        else {
          val dart = r * total
          var cum = 0.0
          var j = 0
          while (j < an.size - 1 && { cum += aw(j); cum <= dart }) j += 1
          Some(an(j))
        }
    }

    val nSchemes = schemes.size

    // manifest includes a structural fingerprint of the scheme masks —
    // resuming under different schemes would silently mix walk families;
    // the per-step snapshots carry schemeId, so a resume continues each
    // walker under its scheme exactly (randomness keys on walkerId, step)
    val run = new DurableRun(spark, store, runName, maxSteps,
      s"metapath seed=$seed portable=$portableRng " +
        s"schemes=${schemes.map(_.map(_.map(b => if (b) '1' else '0').mkString)
          .mkString("+")).mkString(",")} startsFp=${startsFingerprint(starts)}")
    val history = scala.collection.mutable.ArrayBuffer[DataFrame]()
    var (frontier, step) = run.seed(history,
      starts.select(col("walkerId"), lit(0).as("step"), col("curV"),
        pmod(col("walkerId"), lit(nSchemes)).cast("int").as("schemeId")))

    var active = frontier.count()
    while (active > 0 && step < maxSteps) {
      val light = active < LightModeThreshold
      val frontSide = if (light) broadcast(frontier) else frontier
      val adjSide = if (light) pruneAdjToFrontier(adj, frontier, "v", "curV") else adj
      val advanced = frontSide
        .join(adjSide, frontSide("curV") === adjSide("v"))
        .select(col("walkerId"), (col("step") + 1).as("step"),
          sample(col("nbrs"), col("wts"), col("etypes"),
            col("schemeId"), col("step"), randSel(portableRng, seed, "mp")).as("curV"),
          col("schemeId"))
        .filter(col("curV").isNotNull)
      frontier = run.truncate(advanced, step + 1)
      history += frontier
      step += 1
      active = frontier.count()
      System.err.println(s"[graft:$runName] step=$step active=$active")
    }
    adj.unpersist()
    history.map(_.select(col("walkerId"), col("step"), col("curV").as("vertex")))
      .reduce(_ unionAll _)
  }

  /** Metapath walk with LOCAL CHAINING — the [[firstOrderChained]] kernel
    * carrying each walker's schemeId and masking the in-bucket CSR by the
    * scheme's per-step edge-type mask (reference src/apps/metascheme.hpp:
    * 36-63 keeps the same scheme state in its walker messages). Inside a
    * bucket a walker chains masked inverse-CDF steps with zero
    * communication; only bucket-crossers re-shuffle, carrying just their
    * (int) schemeId — no array state. Distributionally identical to
    * [[metapath]] (same masked weights), not bit-identical: the chained
    * RNG keys on splitmix64(seed, walker, step) like the other chained
    * kernels, so results are deterministic across parallelism and bucket
    * counts. Walkers with zero allowed mass at a step terminate, exactly
    * as the join-based sampler does. */
  def metapathChained(
      edges: DataFrame,               // (src, dst, weight, etype)
      starts: DataFrame,              // (walkerId, curV)
      schemes: Seq[Seq[Seq[Boolean]]],
      maxSteps: Int,
      seed: Long = 42L,
      buckets: Int = 0,
      tailThreshold: Long = LightModeThreshold,
      store: Option[graft.engine.Iterate.CheckpointStore] = None,
      runName: String = "chain-mp"): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val nBuckets =
      if (buckets > 0) buckets else math.max(spark.sparkContext.defaultParallelism * 2, 4)
    val maxV = edges.agg(greatest(max("src"), max("dst"))).head().getLong(0)
    val rangeSize = math.max(1L, maxV / nBuckets + 1)

    // typed bucketed CSR: sort_array orders by dst like the join-based
    // metapath's sub-adjacency, so the masked inverse-CDF walks the same
    // support order; v top-level + sorted for the tail's pruned fetches
    // (see GraphOps.bucketedAdjacencyCached)
    val adjDf = edges
      .groupBy(col("src").as("v"))
      .agg(sort_array(collect_list(struct(col("dst"), col("weight"), col("etype")))).as("adjl"))
      .select(col("v"), col("adjl.dst").as("nbrs"), col("adjl.weight").as("wts"),
        col("adjl.etype").as("etypes"))
      .as[graft.model.TypedAdjRow]
      .map(a => (a.v / rangeSize, a.v, a))
      .toDF("bucket", "v", "adj")
      .repartition(col("bucket")) // shuffled once at build — see bucketKeyed
      .sortWithinPartitions("v")
      .persist(StorageLevel.MEMORY_AND_DISK_SER)
    adjDf.count()
    def typed(df: DataFrame) = bucketKeyed[graft.model.TypedAdjRow](df)
    val adjB = typed(adjDf)

    val schemesB = schemes.map(_.map(_.toArray).toArray).toArray
    val nSchemes = schemes.size

    val run = new DurableChainedRun(spark, store, runName,
      s"metapathChained seed=$seed maxSteps=$maxSteps " +
        s"schemes=${schemes.map(_.map(_.map(b => if (b) '1' else '0').mkString)
          .mkString("+")).mkString(",")} startsFp=${startsFingerprint(starts)}")
    val history = scala.collection.mutable.ArrayBuffer[DataFrame]()
    val roundCaches = scala.collection.mutable.ArrayBuffer[DataFrame]()
    var outer = 0
    // frontier: (walkerId, step, curV, schemeId)
    var frontier: Dataset[(Long, Int, Long, Int)] = run.resume() match {
      case Some((rounds, hi)) =>
        rounds.zipWithIndex.foreach { case (df, r) =>
          history += (if (r == 0) df else df.filter(!col("moved")))
            .select(col("walkerId"), col("step"), col("vertex"))
        }
        outer = hi
        rounds.last.filter(col("moved"))
          .select(col("walkerId"), col("step"), col("vertex").as("curV"),
            col("schemeId"))
          .as[(Long, Int, Long, Int)]
      case None =>
        val f0 = starts.select(col("walkerId"), lit(0).as("step"), col("curV"),
            pmod(col("walkerId"), lit(nSchemes)).cast("int").as("schemeId"))
          .as[(Long, Int, Long, Int)]
          .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
        history += f0.toDF("walkerId", "step", "curV", "schemeId")
          .select(col("walkerId"), col("step"), col("curV").as("vertex"))
        if (run.durable)
          run.commitRound(0, f0.toDF("walkerId", "step", "curV", "schemeId")
            .select(col("walkerId"), col("step"), col("curV").as("vertex"),
              col("schemeId"), lit(true).as("moved")), roundCaches)
        f0
    }
    var active = frontier.count()
    try {
      while (active > 0 && outer <= maxSteps) {
        if (active <= tailThreshold) {
          // driver-local tail — see chainedDriverTail
          val foot = chainedDriverTail[(Long, Int, Long, Int),
              graft.model.TypedAdjRow, (Long, Int, Long)](
            frontier.collect(),
            neededOf = w => Seq(w._3),
            fetch = vs => fetchByVertex(adjDf, vs)(_.as[graft.model.TypedAdjRow].collect()),
            fetchAll = lim =>
              fetchAllRows(adjDf, lim)(_.as[graft.model.TypedAdjRow].collect()),
            vOf = _.v,
            degOf = _.nbrs.length,
            advance = { (w, look) =>
              val rows = scala.collection.mutable.ArrayBuffer[(Long, Int, Long)]()
              var (walkerId, step, cur, schemeId) = w
              val scheme = schemesB(schemeId)
              var parked: Option[(Long, Int, Long, Int)] = None
              var done = false
              while (!done && step < maxSteps) {
                look(cur) match {
                  case TailUnfetched =>
                    parked = Some((walkerId, step, cur, schemeId)); done = true
                  case TailDangling => done = true
                  case TailHave(a) =>
                    val nxt = metapathStepKernel(a, walkerId, step, scheme, seed)
                    if (nxt < 0) done = true
                    else { step += 1; cur = nxt; rows += ((walkerId, step, cur)) }
                }
              }
              (rows.toSeq, parked)
            },
            label = "chain-mp")
          val footDf = spark.createDataset(foot).toDF("walkerId", "step", "vertex")
          history += (if (run.durable)
            run.commitRound(outer + 1, footDf
                .withColumn("schemeId", lit(0))
                .withColumn("moved", lit(false)), roundCaches)
              .select(col("walkerId"), col("step"), col("vertex"))
          else footDf)
          active = 0
        } else {
          val grouped = frontier.groupByKey(_._3 / rangeSize)
          // live-bucket CSR prune — see prunedAdjRound
          val adjRound = prunedAdjRound(adjDf, frontier.map(_._3 / rangeSize)
                .distinct().collect(),
              engage = outer >= 1 || active < BucketPruneThreshold, nBuckets)
            .map(typed).getOrElse(adjB)
          val out = grouped.cogroup(adjRound) { (bucket, ws, adjIt) =>
            val csr = new scala.collection.mutable.HashMap[Long, graft.model.TypedAdjRow]
            adjIt.foreach { case (_, a) => csr.update(a.v, a) }
            ws.flatMap { case (walkerId, step0, v0, schemeId) =>
              val rows = scala.collection.mutable.ArrayBuffer[(Long, Int, Long, Int, Boolean)]()
              val scheme = schemesB(schemeId)
              var step = step0
              var cur = v0
              var done = false
              while (!done && step < maxSteps && cur / rangeSize == bucket) {
                csr.get(cur) match {
                  case None => done = true // dangling: terminate
                  case Some(a) =>
                    val nxt = metapathStepKernel(a, walkerId, step, scheme, seed)
                    if (nxt < 0) done = true // no allowed mass: terminate
                    else {
                      step += 1
                      cur = nxt
                      rows += ((walkerId, step, cur, schemeId, false)) // footprint
                    }
                }
              }
              if (!done && step < maxSteps && cur / rangeSize != bucket)
                rows += ((walkerId, step, cur, schemeId, true)) // crossed: re-shuffle
              rows
            }
          }.toDF("walkerId", "step", "vertex", "schemeId", "moved")
          // r4 round shape — see firstOrderChained/sealChained (durable
          // runs commit the round's Parquet instead of the cache)
          val outP = run.commitRound(outer + 1, out, roundCaches)
          history += outP.filter(!col("moved"))
            .select(col("walkerId"), col("step"), col("vertex"))
          val (f2, n) = truncateRealCounted(outP.filter(col("moved"))
            .select(col("walkerId"), col("step"), col("vertex").as("curV"), col("schemeId"))
            .as[(Long, Int, Long, Int)])
          frontier = f2
          outer += 1
          active = n
          System.err.println(s"[graft:chain-mp] outer=$outer active=$active")
        }
      }
      sealChained(history.toSeq, roundCaches.toSeq)
    } catch {
      case e: Throwable =>
        roundCaches.foreach(_.unpersist(false))
        throw e
    } finally {
      // run-local CSR: always released, also when a round throws
      // (ADVICE r4; sealChained on the success path only drops the
      // per-round caches)
      adjDf.unpersist(false)
    }
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
      seed: Long = 42L): DataFrame =
    epochedRun(edges.sparkSession, numWalkers, epochs) { case (begin, end) =>
      firstOrder(edges, startsFor(begin, end), maxSteps, keepProb, seed)
    }

  /** Contiguous walker-id ranges for the epoched variants. The RNG (and
    * metapath's scheme assignment) keys on the ABSOLUTE walkerId, so the
    * union of the per-epoch walks is bitwise-identical to one big run —
    * the memory bound is free of semantic drift (GraphOpsSpec /
    * WalkApiSpec equality tests). */
  private def epochRanges(numWalkers: Long, epochs: Int): Seq[(Long, Long)] = {
    val per = math.max(1L, (numWalkers + epochs - 1) / epochs)
    (0L until numWalkers by per).map(b => (b, math.min(b + per, numWalkers)))
  }

  /** The epoch loop shared by ALL epoched variants (join and chained
    * engines): run each walker range to completion, union the footprints.
    * numWalkers ≤ 0 returns an empty footprint frame instead of letting
    * `reduce` throw on the empty range list (ADVICE r4). */
  private def epochedRun(
      spark: org.apache.spark.sql.SparkSession, numWalkers: Long, epochs: Int)(
      runRange: ((Long, Long)) => DataFrame): DataFrame = {
    val ranges = epochRanges(numWalkers, epochs)
    if (ranges.isEmpty) {
      import spark.implicits._
      Seq.empty[(Long, Int, Long)].toDF("walkerId", "step", "vertex")
    } else ranges.map(runRange).reduce(_ unionAll _)
  }

  /** Epoched second-order walk — the reference's walk-rate memory bound
    * (include/walk.hpp:140-144) is engine-generic; r3 only had it for
    * firstOrder, leaving |V|-walker node2vec with no memory knob
    * (VERDICT r3 #6). Each epoch's frontier (and its prevV state) is
    * bounded by numWalkers/epochs. */
  def node2vecEpoched(
      edges: DataFrame,
      startsFor: (Long, Long) => DataFrame,
      numWalkers: Long,
      epochs: Int,
      maxSteps: Int,
      p: Double = 1.0,
      q: Double = 1.0,
      seed: Long = 42L): DataFrame =
    epochedRun(edges.sparkSession, numWalkers, epochs) { case (begin, end) =>
      node2vec(edges, startsFor(begin, end), maxSteps, p, q, seed)
    }

  /** Epoched metapath walk (see [[node2vecEpoched]]); scheme assignment
    * keys on absolute walkerId (walkerId % nSchemes), so per-epoch start
    * tables MUST carry the global walker ids. */
  def metapathEpoched(
      edges: DataFrame,
      startsFor: (Long, Long) => DataFrame,
      numWalkers: Long,
      epochs: Int,
      schemes: Seq[Seq[Seq[Boolean]]],
      maxSteps: Int,
      seed: Long = 42L): DataFrame =
    epochedRun(edges.sparkSession, numWalkers, epochs) { case (begin, end) =>
      metapath(edges, startsFor(begin, end), schemes, maxSteps, seed)
    }

  /** Epoched × chained composition (VERDICT r4 #4): the reference's walk
    * rate (include/walk.hpp:140-144) bounds in-flight walker state for
    * EVERY engine, and the chained kernels are this engine's default perf
    * path — at |V|-scale walker counts their per-round output cache is
    * the memory hotspot the epoch knob exists to bound. The chained RNG
    * keys on absolute (seed, walkerId, step) only, so epoched == one big
    * run, bitwise (ChainSpec). The bucketed CSR is session-cached, so
    * the epochs share one build. */
  def firstOrderChainedEpoched(
      edges: DataFrame,
      startsFor: (Long, Long) => DataFrame,
      numWalkers: Long,
      epochs: Int,
      maxSteps: Int,
      keepProb: Double = 1.0,
      seed: Long = 42L,
      buckets: Int = 0): DataFrame =
    epochedRun(edges.sparkSession, numWalkers, epochs) { case (begin, end) =>
      firstOrderChained(edges, startsFor(begin, end), maxSteps, keepProb, seed, buckets)
    }

  /** Epoched × chained node2vec (see [[firstOrderChainedEpoched]]). */
  def node2vecChainedEpoched(
      edges: DataFrame,
      startsFor: (Long, Long) => DataFrame,
      numWalkers: Long,
      epochs: Int,
      maxSteps: Int,
      p: Double = 1.0,
      q: Double = 1.0,
      seed: Long = 42L,
      buckets: Int = 0): DataFrame =
    epochedRun(edges.sparkSession, numWalkers, epochs) { case (begin, end) =>
      node2vecChained(edges, startsFor(begin, end), maxSteps, p, q, seed, buckets)
    }

  /** Epoched × chained metapath (see [[firstOrderChainedEpoched]]);
    * scheme assignment keys on absolute walkerId, so per-epoch start
    * tables MUST carry the global walker ids. Unlike the homogeneous
    * kernels the typed CSR is run-local (not session-cached), so each
    * epoch rebuilds it — the trade for the bounded frontier. */
  def metapathChainedEpoched(
      edges: DataFrame,
      startsFor: (Long, Long) => DataFrame,
      numWalkers: Long,
      epochs: Int,
      schemes: Seq[Seq[Seq[Boolean]]],
      maxSteps: Int,
      seed: Long = 42L,
      buckets: Int = 0): DataFrame =
    epochedRun(edges.sparkSession, numWalkers, epochs) { case (begin, end) =>
      metapathChained(edges, startsFor(begin, end), schemes, maxSteps, seed, buckets)
    }

  /** Custom start distribution from an explicit start-vertex table
    * (reference W4, src/apps/ppr.hpp:41-51: walker i starts at
    * startVertices(i mod size) — personalized PageRank source sets). */
  def personalizedStarts(startVertices: DataFrame, numWalkers: Long): DataFrame = {
    val spark = startVertices.sparkSession
    val (indexed, nS) = denseIndexOf(startVertices.select(col("v")).distinct())
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
