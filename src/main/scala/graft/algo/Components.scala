package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.engine.Iterate
import graft.graph.GraphOps

/** Connected components by alternating large-star / small-star contraction
  * (Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC
  * 2014) — each vertex converges to the minimum vertex id of its
  * (undirected) component. Exact ids (north rule: "component/label IDs ...
  * exact").
  *
  * Round k state = the current canonical edge set (src < dst); one round:
  *
  *  - large-star: for every vertex u, connect each strictly-larger
  *    neighbour v > u to m = min(N(u) ∪ {u})
  *  - small-star: orient edges toward the larger endpoint; for every u,
  *    connect u and each smaller neighbour to m = min(N(u))
  *
  * Both operations preserve connectivity, never create inter-component
  * edges, and alternate to a fixpoint (a forest of stars centred on each
  * component's minimum) in O(log² n) rounds — ~13-16 rounds on a 20k-vertex
  * path in simulation REGARDLESS of how ids are ordered along the path.
  *
  * This replaced a min-label + pointer-jump formulation that is O(log n)
  * only when ids are monotone along chains: on randomly-ordered paths
  * (exactly what the cross-conversation tool chains look like, since their
  * order is lexicographic in conv_id while vids are numeric) it needed
  * >300 iterations for 1k vertices and silently hit maxIter.
  *
  * Scale: each phase is one partial-aggregated min + one co-partitioned
  * join + distinct — no collect_list of a full neighbourhood, so a
  * heavy-hitter hub never materializes its adjacency in one task; the hot
  * join key is AQE-skew-splittable. The edge set shrinks every round as
  * stars contract.
  */
object Components {

  /** Star-contraction rounds per [[Iterate]] iteration (work accounting:
    * edge-visits per iteration = |E| × this). Kept at 1 — see the A/B
    * note in [[run]]: fusing rounds recomputes the un-truncated
    * intermediate state and loses. */
  val RoundsPerIteration = 1

  /** One large-star phase over the canonical edge set/multiset. No
    * dedup: the phase emits exactly one row per input row (the v > u side
    * of each symmetrized edge), so the multiset never grows, and min/agg
    * semantics are duplicate-insensitive — a distinct here is a pure
    * extra shuffle (measured: -20% per round without it). */
  private[algo] def largeStar(e: DataFrame): DataFrame = {
    val sym = e.select(col("src").as("u"), col("dst").as("v"))
      .unionAll(e.select(col("dst").as("u"), col("src").as("v")))
    val mins = sym.groupBy("u").agg(min("v").as("mv"))
    sym.join(mins, "u")
      .filter(col("v") > col("u"))
      .select(least(col("u"), col("mv")).as("src"), col("v").as("dst"))
  }

  /** One small-star phase; `dedup` closes the round with a distinct so
    * the state fed to the next round (and the convergence fingerprint)
    * is a set. */
  private[algo] def smallStar(e: DataFrame, dedup: Boolean = true): DataFrame = {
    val oriented = e.select(col("dst").as("u"), col("src").as("v")) // u > v
    val mins = oriented.groupBy("u").agg(min("v").as("mv"))
    val out = oriented.join(mins, "u")
      .filter(col("v") =!= col("mv"))
      .select(col("mv").as("src"), col("v").as("dst"))
      .unionAll(mins.select(col("mv").as("src"), col("u").as("dst")))
    if (dedup) out.distinct() else out
  }

  /** Exact multiset fingerprint of an edge set: (count, Σ xxhash64). Two
    * consecutive rounds with equal fingerprints ⇒ fixpoint (the iteration
    * is deterministic, so equality of the 128-bit aggregate is equality of
    * the sets up to a vanishing hash-collision probability — and any
    * false stop would fail the exact DuckDB oracle). */
  private def fingerprint(e: DataFrame): (Long, java.math.BigDecimal) = {
    val r = e.agg(
      count(lit(1)),
      coalesce(sum(xxhash64(col("src"), col("dst")).cast("decimal(38,0)")),
        lit(java.math.BigDecimal.ZERO))).head()
    (r.getLong(0), r.getDecimal(1))
  }

  /** @return (v LONG, comp LONG); `strict` throws if `maxIter` is reached
    *         before the star fixpoint (no silent non-convergence). */
  def run(
      edges: DataFrame,
      maxIter: Int = 50,
      store: Option[Iterate.CheckpointStore] = None,
      runName: String = "cc",
      strict: Boolean = true,
      // A/B r2 (300k convs / 6.5M edges): pure groupBy+join rounds beat
      // distinct-closed rounds by 11-18% with identical results and round
      // count — min-aggregation is duplicate-insensitive and small-star
      // naturally contracts duplicated star edges, so the multiset stays
      // bounded by |E| and dedup buys nothing but a shuffle
      smallDedup: Boolean = false,
      memTruncate: Boolean = false): DataFrame = {
    val verts = GraphOps.vertices(edges)

    val state0 = edges
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("src"),
        greatest(col("src"), col("dst")).as("dst"))
      .distinct()

    // the round's fingerprint rides the truncation write as an observe()
    // metric: the old separate fingerprint(next) agg re-scanned the whole
    // just-written state from parquet once per round — at 33M edges that
    // second full-state job was ~10% of the round
    // ONE star round per truncation. A/B (r3, sf0.1): fusing TWO rounds
    // per truncation to halve the barrier count made CC 46% SLOWER
    // (12.3 → 18.0 s) — each star phase references its input under two
    // different projections (the symmetrized union and the min-agg), so
    // the un-truncated intermediate round is a 4-stage subtree that
    // ReuseExchange cannot dedup and it recomputes ~2×; the parquet
    // round-trip IS the cheap materialization that makes every reference
    // to the round's input a file scan.
    var curObs: Option[org.apache.spark.sql.Observation] = None
    def step(state: DataFrame, iter: Int): DataFrame = {
      val obs = new org.apache.spark.sql.Observation(s"$runName-fp-$iter")
      curObs = Some(obs)
      smallStar(largeStar(state), smallDedup).observe(obs,
        count(lit(1)).as("cnt"),
        coalesce(sum(xxhash64(col("src"), col("dst")).cast("decimal(38,0)")),
          lit(java.math.BigDecimal.ZERO)).as("fp"))
    }

    // converged ⇔ the edge set is stable across one full round; the
    // previous round's fingerprint is carried so each check is metric
    // reads only (the state0 fingerprint is the one explicit agg)
    var prevFp: Option[(Long, java.math.BigDecimal)] = None
    def converged(prev: DataFrame, next: DataFrame, iter: Int): Boolean = {
      val pf = prevFp.getOrElse(fingerprint(prev))
      val m = curObs.get.get // populated by the truncation write action
      val nf = (m("cnt").asInstanceOf[Long],
        m("fp") match {
          case d: java.math.BigDecimal => d
          case d: BigDecimal => d.bigDecimal
        })
      prevFp = Some(nf)
      // compareTo, not equals: BigDecimal.equals is scale-sensitive and
      // the agg-path and metric-path decimals can differ in scale
      pf._1 == nf._1 && pf._2.compareTo(nf._2) == 0
    }

    val stars = Iterate.run(runName, state0, step, converged, maxIter, None, store, memTruncate)
    if (strict && !Iterate.lastConverged)
      throw new IllegalStateException(
        s"[graft:$runName] connected components did not reach the star fixpoint in $maxIter rounds")

    // fixpoint = stars (root = component min as src); min() is belt and
    // braces for the pre-fixpoint state when strict=false
    val parents = stars.groupBy(col("dst").as("v")).agg(min("src").as("comp"))
    verts.join(parents, Seq("v"), "left")
      .select(col("v"), coalesce(col("comp"), col("v")).as("comp"))
  }
}
