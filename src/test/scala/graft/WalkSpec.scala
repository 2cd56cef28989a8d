package graft

import org.apache.spark.sql.functions._
import graft.algo.PageRank
import graft.graph.GraphOps
import graft.walk.Walk

/** Walk-engine tests following the reference's two families (SURVEY.md §5):
  * exact plumbing invariants + statistical frequency-matrix checks
  * (reference cmp_trans_matrix, src/tests/test_walk.hpp:73-186), upgraded
  * with exact-replay determinism thanks to the hash-RNG. */
class WalkSpec extends SparkSpec {

  lazy val smallGraph = randomEdges(vNum = 30, eNum = 200, seed = 13).cache()

  test("truncated walk: every walker has one path of length <= L+1, steps contiguous") {
    val starts = Walk.equalStarts(smallGraph, 100)
    val fp = Walk.firstOrder(smallGraph, starts, maxSteps = 5)
    val paths = Walk.paths(fp).collect()
    assert(paths.length === 100)
    paths.foreach { r =>
      val p = r.getSeq[Long](1)
      assert(p.nonEmpty && p.size <= 6)
    }
    // footprints: exactly one vertex per (walker, step), steps 0..len-1
    val bad = fp.groupBy("walkerId", "step").count().filter(col("count") > 1)
    assert(bad.isEmpty)
  }

  test("walks are deterministic across runs and parallelism") {
    val starts = Walk.equalStarts(smallGraph, 50)
    val a = Walk.firstOrder(smallGraph, starts, maxSteps = 4)
      .orderBy("walkerId", "step").collect().toSeq
    val b = Walk.firstOrder(smallGraph.repartition(7), starts, maxSteps = 4)
      .orderBy("walkerId", "step").collect().toSeq
    assert(a === b)
  }

  test("first-order transition frequencies match weights (reference-style matrix test)") {
    // many walkers per vertex, one step: empirical P(v->u) ~ w(v,u)/outW(v)
    val edges = collectEdges(smallGraph)
    val outW = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val nV = edges.flatMap(e => Seq(e._1, e._2)).distinct.size
    val walkers = nV * 2000L
    val fp = Walk.firstOrder(smallGraph, Walk.equalStarts(smallGraph, walkers), maxSteps = 1)
    val pathsByWalker = Walk.paths(fp).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
    // transitions observed
    val trans = scala.collection.mutable.Map[(Long, Long), Long]().withDefaultValue(0L)
    val startCount = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    pathsByWalker.values.foreach { p =>
      if (p.size == 2) { trans((p(0), p(1))) += 1; startCount(p(0)) += 1 }
      else startCount(p(0)) += 1 // dangling start (no out-edges)
    }
    // support match: every observed transition is a real edge
    trans.keys.foreach { case (s, d) =>
      assert(edges.exists(e => e._1 == s && e._2 == d), s"phantom edge $s->$d")
    }
    // frequency match: summed squared error bounded (reference variance < 1)
    var sqErr = 0.0
    for ((s, d, w) <- edges if startCount(s) > 0) {
      val expP = w / outW(s)
      val gotP = trans((s, d)).toDouble / startCount(s)
      sqErr += (expP - gotP) * (expP - gotP)
    }
    assert(sqErr < 0.05, s"sqErr=$sqErr")
  }

  test("geometric termination: mean path length ~ 1/(1-keepProb)") {
    val keep = 0.75
    val fp = Walk.firstOrder(smallGraph, Walk.equalStarts(smallGraph, 4000),
      maxSteps = 60, keepProb = keep)
    val lens = Walk.paths(fp).select(size(col("path"))).collect().map(_.getInt(0).toDouble)
    val mean = lens.sum / lens.length
    assert(math.abs(mean - 1.0 / (1 - keep)) < 0.3, s"mean=$mean")
  }

  test("PPR/damped-walk visit frequencies match power-iteration PageRank (north rule)") {
    // no dangling vertices: use the undirected view
    val und = GraphOps.undirect(smallGraph).groupBy("src", "dst")
      .agg(sum("weight").as("weight")).cache()
    val alpha = 0.85
    val walkers = 60000L
    val fp = Walk.firstOrder(und, Walk.uniformStarts(und, walkers, seed = 99),
      maxSteps = 80, keepProb = alpha, seed = 17)
    val visits = Walk.visitCounts(fp).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val totalVisits = visits.values.sum.toDouble
    val ranks = PageRank.run(und, alpha = alpha, tol = 1e-9, maxIter = 120)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(visits.keySet === ranks.keySet)
    // tolerance band: relative error per vertex < 10%, mean < 3%
    val relErrs = ranks.map { case (v, rk) =>
      math.abs(visits(v) / totalVisits - rk) / rk
    }.toSeq
    assert(relErrs.max < 0.10, s"max rel err ${relErrs.max}")
    assert(relErrs.sum / relErrs.size < 0.03, s"mean rel err ${relErrs.sum / relErrs.size}")
  }

  test("node2vec: exact 2nd-order distribution (1/p,1,1/q cases) via frequency matrix") {
    val p = 2.0; val q = 0.5
    val edges = collectEdges(smallGraph)
    val adj = edges.groupBy(_._1).view.mapValues(_.map(e => e._2 -> e._3).toMap).toMap
    val fp = Walk.node2vec(smallGraph, Walk.equalStarts(smallGraph, 60000),
      maxSteps = 2, p = p, q = q, seed = 23)
    val paths = Walk.paths(fp).collect().map(r => r.getSeq[Long](1)).filter(_.size == 3)
    // empirical P(v2 | v0->v1) vs analytic
    val byEdge = paths.groupBy(pp => (pp(0), pp(1)))
    var sqErr = 0.0; var cases = 0
    for (((v0, v1), ps) <- byEdge if ps.length >= 300) {
      val nbrs = adj(v1)
      val biased = nbrs.map { case (c, w) =>
        val bias = if (c == v0) 1 / p
          else if (adj.get(v0).exists(_.contains(c))) 1.0
          else 1 / q
        c -> w * bias
      }
      val tot = biased.values.sum
      val counts = ps.groupBy(_(2)).view.mapValues(_.length).toMap
      // support: only legal next-vertices observed
      assert(counts.keySet.subsetOf(nbrs.keySet))
      for ((c, bw) <- biased) {
        val gotP = counts.getOrElse(c, 0).toDouble / ps.length
        val expP = bw / tot
        sqErr += (gotP - expP) * (gotP - expP); cases += 1
      }
    }
    assert(cases > 50, s"only $cases cases with enough samples")
    assert(sqErr / cases < 0.001, s"mean sqErr ${sqErr / cases}")
  }
}
