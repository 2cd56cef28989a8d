package graft

import org.apache.spark.sql.functions._
import graft.algo.PageRank
import graft.graph.GraphOps
import graft.walk.Walk

/** The reference's shipped dataset (FIXTURES.md §3): Zachary's karate
  * club, 34 vertices, 156 weighted directed rows (both directions
  * materialized), weights in [1,5] — inlined verbatim. Used exactly as
  * the reference uses it: walk-distribution checks on a graph small
  * enough for dense analytic transition matrices. */
class KarateSpec extends SparkSpec {
  import spark.implicits._

  lazy val karate = Seq[(Long, Long, Double)](
      (0L, 1L, 3.538506), (1L, 0L, 3.538506), (0L, 2L, 2.515933), (2L, 0L, 2.515933),
      (1L, 2L, 4.059677), (2L, 1L, 4.059677), (0L, 3L, 1.172845), (3L, 0L, 1.172845),
      (1L, 3L, 2.689819), (3L, 1L, 2.689819), (2L, 3L, 1.483943), (3L, 2L, 1.483943),
      (0L, 4L, 1.807849), (4L, 0L, 1.807849), (0L, 5L, 2.370823), (5L, 0L, 2.370823),
      (0L, 6L, 1.216081), (6L, 0L, 1.216081), (4L, 6L, 3.227547), (6L, 4L, 3.227547),
      (5L, 6L, 3.434725), (6L, 5L, 3.434725), (0L, 7L, 3.106331), (7L, 0L, 3.106331),
      (1L, 7L, 2.649880), (7L, 1L, 2.649880), (2L, 7L, 4.531705), (7L, 2L, 4.531705),
      (3L, 7L, 2.567124), (7L, 3L, 2.567124), (0L, 8L, 2.369877), (8L, 0L, 2.369877),
      (2L, 8L, 3.491359), (8L, 2L, 3.491359), (2L, 9L, 3.645327), (9L, 2L, 3.645327),
      (0L, 10L, 2.779170), (10L, 0L, 2.779170), (4L, 10L, 1.159114), (10L, 4L, 1.159114),
      (5L, 10L, 3.126820), (10L, 5L, 3.126820), (0L, 11L, 2.977620), (11L, 0L, 2.977620),
      (0L, 12L, 3.819623), (12L, 0L, 3.819623), (3L, 12L, 2.776547), (12L, 3L, 2.776547),
      (0L, 13L, 1.969233), (13L, 0L, 1.969233), (1L, 13L, 1.783335), (13L, 1L, 1.783335),
      (2L, 13L, 4.946900), (13L, 2L, 4.946900), (3L, 13L, 1.482988), (13L, 3L, 1.482988),
      (5L, 16L, 2.069196), (16L, 5L, 2.069196), (6L, 16L, 4.025124), (16L, 6L, 4.025124),
      (0L, 17L, 1.518577), (17L, 0L, 1.518577), (1L, 17L, 3.394261), (17L, 1L, 3.394261),
      (0L, 19L, 2.041254), (19L, 0L, 2.041254), (1L, 19L, 1.257416), (19L, 1L, 1.257416),
      (0L, 21L, 2.863664), (21L, 0L, 2.863664), (1L, 21L, 3.775154), (21L, 1L, 3.775154),
      (23L, 25L, 1.476720), (25L, 23L, 1.476720), (24L, 25L, 3.344883), (25L, 24L, 3.344883),
      (2L, 27L, 1.631003), (27L, 2L, 1.631003), (23L, 27L, 1.259503), (27L, 23L, 1.259503),
      (24L, 27L, 3.743950), (27L, 24L, 3.743950), (2L, 28L, 1.267692), (28L, 2L, 1.267692),
      (23L, 29L, 4.195999), (29L, 23L, 4.195999), (26L, 29L, 4.241080), (29L, 26L, 4.241080),
      (1L, 30L, 2.393064), (30L, 1L, 2.393064), (8L, 30L, 4.575807), (30L, 8L, 4.575807),
      (0L, 31L, 4.909878), (31L, 0L, 4.909878), (24L, 31L, 4.379878), (31L, 24L, 4.379878),
      (25L, 31L, 4.378621), (31L, 25L, 4.378621), (28L, 31L, 2.241010), (31L, 28L, 2.241010),
      (2L, 32L, 2.392879), (32L, 2L, 2.392879), (8L, 32L, 4.768964), (32L, 8L, 4.768964),
      (14L, 32L, 3.023016), (32L, 14L, 3.023016), (15L, 32L, 3.348872), (32L, 15L, 3.348872),
      (18L, 32L, 4.267445), (32L, 18L, 4.267445), (20L, 32L, 1.784101), (32L, 20L, 1.784101),
      (22L, 32L, 1.108475), (32L, 22L, 1.108475), (23L, 32L, 2.189993), (32L, 23L, 2.189993),
      (29L, 32L, 4.871804), (32L, 29L, 4.871804), (30L, 32L, 3.364336), (32L, 30L, 3.364336),
      (31L, 32L, 2.173304), (32L, 31L, 2.173304), (8L, 33L, 1.815407), (33L, 8L, 1.815407),
      (9L, 33L, 1.441829), (33L, 9L, 1.441829), (13L, 33L, 4.211970), (33L, 13L, 4.211970),
      (14L, 33L, 3.350339), (33L, 14L, 3.350339), (15L, 33L, 4.545505), (33L, 15L, 4.545505),
      (18L, 33L, 4.811336), (33L, 18L, 4.811336), (19L, 33L, 3.436336), (33L, 19L, 3.436336),
      (20L, 33L, 1.869910), (33L, 20L, 1.869910), (22L, 33L, 1.912417), (33L, 22L, 1.912417),
      (23L, 33L, 1.874151), (33L, 23L, 1.874151), (26L, 33L, 3.170091), (33L, 26L, 3.170091),
      (27L, 33L, 3.103037), (33L, 27L, 3.103037), (28L, 33L, 1.400125), (33L, 28L, 1.400125),
      (29L, 33L, 3.157062), (33L, 29L, 3.157062), (30L, 33L, 3.829920), (33L, 30L, 3.829920),
      (31L, 33L, 3.994515), (33L, 31L, 3.994515), (32L, 33L, 3.117719), (33L, 32L, 3.117719)
  ).toDF("src", "dst", "weight").cache()

  test("karate: weighted transition frequencies match analytic matrix") {
    val edges = collectEdges(karate)
    val outW = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val fp = Walk.firstOrder(karate, Walk.equalStarts(karate, 34 * 3000L), maxSteps = 1)
    val paths = Walk.paths(fp).collect().map(_.getSeq[Long](1))
    val trans = scala.collection.mutable.Map[(Long, Long), Long]().withDefaultValue(0L)
    val starts = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    paths.foreach { p => starts(p(0)) += 1; if (p.size == 2) trans((p(0), p(1))) += 1 }
    // support must match exactly (reference cmp_trans_matrix)
    trans.keys.foreach { case (s, d) =>
      assert(edges.exists(e => e._1 == s && e._2 == d), s"phantom $s->$d") }
    var sqErr = 0.0
    for ((s, d, w) <- edges) {
      val expP = w / outW(s)
      val gotP = trans((s, d)).toDouble / starts(s)
      sqErr += (expP - gotP) * (expP - gotP)
    }
    assert(sqErr < 0.05, s"sqErr=$sqErr")
  }

  test("karate: damped-walk stationarity tracks PageRank (no dangling vertices)") {
    val ranks = PageRank.run(karate, tol = 1e-9, maxIter = 150)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ranks.size === 34)
    assert(math.abs(ranks.values.sum - 1.0) < 1e-9)
    val fp = Walk.firstOrder(karate, Walk.uniformStarts(karate, 80000, seed = 5),
      maxSteps = 80, keepProb = 0.85, seed = 6)
    val visits = Walk.visitCounts(fp).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val tot = visits.values.sum.toDouble
    val relErrs = ranks.map { case (v, rk) => math.abs(visits(v) / tot - rk) / rk }
    assert(relErrs.max < 0.10, s"max rel err ${relErrs.max}")
  }

  test("karate: CC finds one component, triangles exact vs brute force") {
    val cc = graft.algo.Components.run(karate).select("comp").distinct().collect()
    assert(cc.length === 1 && cc.head.getLong(0) === 0L)
    val got = graft.algo.Triangles.count(karate).head().getLong(0)
    val und = collectEdges(karate).map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct.toSet
    val vs = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    var exp = 0L
    for { i <- vs.indices; j <- (i + 1) until vs.size; k <- (j + 1) until vs.size
          if und((vs(i), vs(j))) && und((vs(j), vs(k))) && und((vs(i), vs(k))) } exp += 1
    assert(got === exp)
  }
}
