package graft

import org.apache.spark.sql.functions._
import graft.walk.Walk
import graft.walk.Walk.{Extension, SecondOrderConfig, StaticComp, TransitionConfig}

/** Generic Pe/Ps/Pd transition API — parity with the reference's example
  * programs (src/examples/simple_walk.cpp, biased_walk.cpp,
  * dynamic_walk.cpp) and with the engine's tuned built-in walks.
  */
class WalkApiSpec extends SparkSpec {

  private def startsAt(v: Long, m: Long) = {
    import spark.implicits._
    spark.range(m).select(col("id").as("walkerId"), lit(v).as("curV"))
  }

  /** Empirical next-vertex distribution of the FIRST step from `v0`. */
  private def firstStepFreq(fp: org.apache.spark.sql.DataFrame): Map[Long, Double] = {
    val rows = fp.filter(col("step") === 1).groupBy("vertex").count().collect()
    val total = rows.map(_.getLong(1)).sum.toDouble
    rows.map(r => r.getLong(0) -> r.getLong(1) / total).toMap
  }

  // graph: 0 -> {1 (w1), 2 (w2), 3 (w5)}; 1,2,3 -> 0 (so walks continue)
  private def fanGraph = {
    import spark.implicits._
    Seq((0L, 1L, 1.0), (0L, 2L, 2.0), (0L, 3L, 5.0),
      (1L, 0L, 1.0), (2L, 0L, 1.0), (3L, 0L, 1.0)).toDF("src", "dst", "weight")
  }

  test("simple_walk parity: constant Pe, unbiased Ps -> uniform choice + geometric length") {
    val edges = fanGraph
    val fp = Walk.generic(edges, startsAt(0L, 30000), maxSteps = 12,
      TransitionConfig(Extension.Constant(0.5), StaticComp.Unbiased), seed = 9)
    // unbiased: each of the 3 out-edges of 0 equally likely among survivors
    val f = firstStepFreq(fp)
    Seq(1L, 2L, 3L).foreach(v => assert(math.abs(f(v) - 1.0 / 3) < 0.02, s"f($v)=${f(v)}"))
    // Pe = 0.5: ~half the walkers advance each step (geometric tail)
    val byStep = fp.groupBy("step").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val ratio1 = byStep(1).toDouble / byStep(0)
    val ratio2 = byStep(2).toDouble / byStep(1)
    assert(math.abs(ratio1 - 0.5) < 0.02, s"step1/step0=$ratio1")
    assert(math.abs(ratio2 - 0.5) < 0.03, s"step2/step1=$ratio2")
  }

  test("biased_walk parity: Ps = edge weight -> choice proportional to weight") {
    val edges = fanGraph
    val fp = Walk.generic(edges, startsAt(0L, 30000), maxSteps = 1,
      TransitionConfig(Extension.Always, StaticComp.EdgeWeight,
        // force the non-trivial engine path (identity dynamic component)
        dynamic = Some((_, _, _, _) => 1.0)), seed = 10)
    val f = firstStepFreq(fp)
    assert(math.abs(f(1L) - 1.0 / 8) < 0.02)
    assert(math.abs(f(2L) - 2.0 / 8) < 0.02)
    assert(math.abs(f(3L) - 5.0 / 8) < 0.02)
  }

  test("dynamic_walk parity: user Pd reshapes the distribution exactly") {
    val edges = fanGraph
    // Pd doubles even-id candidates: P ∝ w * (dst%2==0 ? 2 : 1)
    //   -> 1:1, 2:4, 3:5 of 10
    val fp = Walk.generic(edges, startsAt(0L, 30000), maxSteps = 1,
      TransitionConfig(dynamic = Some((_, _, dst, _) => if (dst % 2 == 0) 2.0 else 1.0)),
      seed = 11)
    val f = firstStepFreq(fp)
    assert(math.abs(f(1L) - 0.1) < 0.02)
    assert(math.abs(f(2L) - 0.4) < 0.02)
    assert(math.abs(f(3L) - 0.5) < 0.02)
  }

  test("step-dependent Pd: bias applies only on odd steps") {
    val edges = fanGraph
    val fp = Walk.generic(edges, startsAt(0L, 30000), maxSteps = 2,
      TransitionConfig(dynamic = Some((step, _, dst, _) =>
        if (step % 2 == 1 && dst == 1L) 100.0 else 1.0)), seed = 12)
    val f1 = firstStepFreq(fp) // step 0 -> unbiased by Pd (weights only)
    assert(math.abs(f1(3L) - 5.0 / 8) < 0.02)
    // step 1 happens at vertices 1/2/3 whose only nbr is 0 -> can't observe
    // the bias there; instead check at step parity via a 2-step star:
    // walkers at 0 on step 0 go somewhere, return is forced; nothing to
    // assert beyond determinism:
    val fp2 = Walk.generic(edges, startsAt(0L, 500), maxSteps = 2,
      TransitionConfig(dynamic = Some((step, _, dst, _) =>
        if (step % 2 == 1 && dst == 1L) 100.0 else 1.0)), seed = 12)
    assert(fp.filter(col("walkerId") < 500).collect().toSet ===
      fp2.collect().toSet) // RNG keyed on (seed, walker, step) only
  }

  test("per-vertex Pe: a zero-extension vertex terminates every walker") {
    import spark.implicits._
    val edges = fanGraph
    val pe = Seq((0L, 1.0), (1L, 0.0), (2L, 1.0), (3L, 1.0)).toDF("v", "pe")
    val fp = Walk.generic(edges, startsAt(0L, 2000), maxSteps = 4,
      TransitionConfig(Extension.PerVertex(pe)), seed = 13)
    // any walker that reaches vertex 1 must never take another step
    val atOne = fp.filter(col("vertex") === 1L)
      .select(col("walkerId"), col("step")).as[(Long, Int)].collect().toSet
    val continued = fp.as[(Long, Int, Long)].collect()
      .filter { case (w, s, _) => atOne.contains((w, s - 1)) }
    assert(continued.isEmpty, s"walkers stepped out of a Pe=0 vertex: ${continued.take(3).toSeq}")
    assert(atOne.nonEmpty)
  }

  test("reference simple_walk constants: Pe = 0.875 survival ratio") {
    // src/examples/simple_walk.cpp:35-53 uses a constant extension 0.875
    val edges = fanGraph
    val fp = Walk.generic(edges, startsAt(0L, 40000), maxSteps = 6,
      TransitionConfig(Extension.Constant(0.875), StaticComp.Unbiased), seed = 14)
    val byStep = fp.groupBy("step").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    (1 to 3).foreach { s =>
      val ratio = byStep(s).toDouble / byStep(s - 1)
      assert(math.abs(ratio - 0.875) < 0.02, s"step$s ratio=$ratio")
    }
  }

  test("reference dynamic_walk constants: return-edge x2 (ub = 2)") {
    // src/examples/dynamic_walk.cpp:52-93 doubles the probability of the
    // edge returning to the walker's previous vertex; the walker state it
    // tracks by hand is our second-order prevV
    val edges = fanGraph
    val cfg = SecondOrderConfig(
      static = StaticComp.Unbiased,
      dynamic2 = (_, prevV, _, dst, _) => if (dst == prevV) 2.0 else 1.0)
    val fp = Walk.generic2(edges, startsAt(1L, 30000), maxSteps = 2, cfg, seed = 15)
    // step 0: 1 -> 0 (only edge). step 1 at vertex 0 with prevV = 1:
    // biases 2,1,1 over nbrs {1,2,3} -> P = 1/2, 1/4, 1/4
    val f = firstStepFreq(fp.filter(col("step") >= 1)
      .withColumn("step", col("step") - 1))
    assert(math.abs(f(1L) - 0.5) < 0.02, s"return ${f(1L)}")
    assert(math.abs(f(2L) - 0.25) < 0.02)
    assert(math.abs(f(3L) - 0.25) < 0.02)
  }

  test("generic with default config == firstOrder (same salts, same draws)") {
    val edges = randomEdges(vNum = 50, eNum = 200, seed = 31)
    val starts = Walk.equalStarts(edges, 300)
    val a = Walk.generic(edges, starts, maxSteps = 6, TransitionConfig(), seed = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val b = Walk.firstOrder(edges, starts, maxSteps = 6, seed = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(a === b)
  }

  test("generic2 with the node2vec bias == node2vec (draw-for-draw)") {
    val edges = randomEdges(vNum = 40, eNum = 240, seed = 32)
    val starts = Walk.equalStarts(edges, 200)
    val p = 2.0; val q = 0.5
    val cfg = SecondOrderConfig(dynamic2 = (_, prevV, prevNbrs, dst, _) =>
      if (dst == prevV) 1.0 / p
      else if (prevNbrs != null &&
        java.util.Arrays.binarySearch(prevNbrs.toArray, dst) >= 0) 1.0
      else 1.0 / q)
    val a = Walk.generic2(edges, starts, maxSteps = 5, cfg, seed = 6)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val b = Walk.node2vec(edges, starts, maxSteps = 5, p = p, q = q, seed = 6)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(a === b)
  }
}
