package graft

import org.apache.spark.sql.functions._
import graft.walk.Walk

/** Local-chaining walk fast path: same semantics as the join-based walk
  * (distributionally), deterministic across parallelism. */
class ChainSpec extends SparkSpec {

  lazy val g = randomEdges(vNum = 30, eNum = 200, seed = 13).cache()

  test("chained walk: one path per walker, contiguous steps, length <= L+1") {
    val fp = Walk.firstOrderChained(g, Walk.equalStarts(g, 100), maxSteps = 5)
    val paths = Walk.paths(fp).collect()
    assert(paths.length === 100)
    paths.foreach { r =>
      val p = r.getSeq[Long](1)
      assert(p.nonEmpty && p.size <= 6)
    }
    assert(fp.groupBy("walkerId", "step").count().filter(col("count") > 1).isEmpty)
    // every consecutive footprint pair is a real edge
    val edges = collectEdges(g).map(e => (e._1, e._2)).toSet
    paths.foreach { r =>
      r.getSeq[Long](1).sliding(2).foreach { pr =>
        if (pr.size == 2) assert(edges((pr(0), pr(1))), s"phantom ${pr(0)}->${pr(1)}")
      }
    }
  }

  test("chained walk is deterministic across parallelism and bucket counts") {
    val starts = Walk.equalStarts(g, 50)
    val a = Walk.firstOrderChained(g, starts, maxSteps = 4, buckets = 2)
      .orderBy("walkerId", "step").collect().toSeq
    val b = Walk.firstOrderChained(g.repartition(7), starts, maxSteps = 4, buckets = 5)
      .orderBy("walkerId", "step").collect().toSeq
    assert(a === b)
  }

  test("chained walk transition frequencies match weights") {
    val edges = collectEdges(g)
    val outW = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val nV = edges.flatMap(e => Seq(e._1, e._2)).distinct.size
    val fp = Walk.firstOrderChained(g, Walk.equalStarts(g, nV * 2000L), maxSteps = 1)
    val paths = Walk.paths(fp).collect().map(r => r.getSeq[Long](1))
    val trans = scala.collection.mutable.Map[(Long, Long), Long]().withDefaultValue(0L)
    val startCount = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    paths.foreach { p =>
      startCount(p(0)) += 1
      if (p.size == 2) trans((p(0), p(1))) += 1
    }
    var sqErr = 0.0
    for ((s, d, w) <- edges if startCount(s) > 0) {
      val expP = w / outW(s)
      val gotP = trans((s, d)).toDouble / startCount(s)
      sqErr += (expP - gotP) * (expP - gotP)
    }
    assert(sqErr < 0.05, s"sqErr=$sqErr")
  }

  test("chained geometric termination: mean length ~ 1/(1-keepProb)") {
    val keep = 0.75
    val fp = Walk.firstOrderChained(g, Walk.equalStarts(g, 4000),
      maxSteps = 60, keepProb = keep)
    val lens = Walk.paths(fp).select(size(col("path"))).collect().map(_.getInt(0).toDouble)
    val mean = lens.sum / lens.length
    assert(math.abs(mean - 1.0 / (1 - keep)) < 0.3, s"mean=$mean")
  }

  test("chaining actually chains on chain-shaped graphs (few outer rounds)") {
    import spark.implicits._
    // one long path graph: all steps should complete in ~1 outer round
    val chain = (0L until 200L).sliding(2).map(p => (p(0), p(1), 1.0)).toSeq
      .toDF("src", "dst", "weight")
    val starts = Seq((0L, 0L), (1L, 50L)).toDF("walkerId", "curV")
    val fp = Walk.firstOrderChained(chain, starts, maxSteps = 30, buckets = 2)
    val paths = Walk.paths(fp).collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(paths(0L) === (0L to 30L))
    assert(paths(1L) === (50L to 80L))
  }
}
