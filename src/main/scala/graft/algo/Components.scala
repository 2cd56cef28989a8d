package graft.algo

import scala.jdk.CollectionConverters._

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

  /** Partition-local contraction pre-pass: range-partition the canonical
    * edge set by `src`, run a per-partition union-find (union by MINIMUM
    * id — the local root of every piece is its local min, so composing
    * with the global star fixpoint preserves exact component ids), and
    * rewrite edges through the local roots. On transcript graphs the
    * derivation assigns consecutive dense vids along each conversation,
    * so a range partition holds nearly every succession edge and whole
    * conv-chains collapse to single vertices BEFORE the O(log²) global
    * loop — the same local-aggregation-before-exchange shape as a
    * map-side combine, applied to connectivity. Kiveris et al. §6.2
    * describe exactly this "local contraction" optimization. Cost: one
    * range shuffle + the mapping join; win: the iterated state (and the
    * per-round barrier) shrinks by the chain compression ratio and the
    * round count drops with the diameter.
    *
    * @return (contracted canonical edge set, mapping v → localRoot with
    *         only v ≠ root rows) */
  private[algo] def localContract(state0: DataFrame): (DataFrame, DataFrame) = {
    val spark = state0.sparkSession
    import spark.implicits._
    val mapping = state0.select(col("src"), col("dst")).as[(Long, Long)]
      .repartitionByRange(col("src"))
      .mapPartitions { it =>
        val parent = new java.util.HashMap[Long, Long]()
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrDefault(r, r) != r) r = parent.get(r)
          var c = x // path compression
          while (parent.getOrDefault(c, c) != c) {
            val n = parent.get(c); parent.put(c, r); c = n
          }
          r
        }
        it.foreach { case (a, b) =>
          val ra = find(a); val rb = find(b)
          if (ra != rb) { // union by min: root IS the local minimum
            parent.put(math.max(ra, rb), math.min(ra, rb))
          }
        }
        // snapshot the key set before emitting: find() path-compression
        // puts would otherwise race the live entrySet iterator — safe
        // today only because every put hits an existing key, and that
        // invariant should not be load-bearing (ADVICE r4)
        val ks = parent.keySet().iterator().asScala.map(_.longValue).toArray
        ks.iterator
          .map(k => (k, find(k)))
          .filter { case (v, r) => v != r }
      }
      .toDF("v", "root")
      // ONE root per vertex: a vertex on a range boundary joins a local
      // piece in EVERY partition that holds one of its edges, and the
      // duplicate (v, root) rows would multiply the contraction joins and
      // the final compose (caught by the q_cc oracle: 1005 rows for 1000
      // vertices). Keeping only min(root) stays connectivity-exact: each
      // of v's edges rewrites through the kept root, so the dropped
      // pieces still link to it via every incident edge.
      .groupBy("v").agg(min("root").as("root"))
    // real-stats truncation (persist+count, checkpoint, release): the
    // mapping is referenced three times (both contraction joins + the
    // final compose, in different actions) and the range partitioner's
    // sampled bounds should be drawn exactly once
    val ser = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
    val cached = mapping.persist(ser)
    cached.count()
    val mappingT = cached.localCheckpoint(true, ser)
    cached.unpersist(false)
    val srcM = mappingT.select(col("v").as("src"), col("root").as("sroot"))
    val dstM = mappingT.select(col("v").as("dst"), col("root").as("droot"))
    val contracted = state0
      .join(srcM, Seq("src"), "left")
      .join(dstM, Seq("dst"), "left")
      .select(coalesce(col("sroot"), col("src")).as("a"),
        coalesce(col("droot"), col("dst")).as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("src"),
        greatest(col("a"), col("b")).as("dst"))
      .distinct()
    (contracted, mappingT)
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

  /** Explain-only replica of one star round over the canonical edge set
    * (r06 plan audit). Never executed by the engine. */
  def roundPlanForExplain(edges: DataFrame): DataFrame = {
    val canonical = edges
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("src"),
        greatest(col("src"), col("dst")).as("dst"))
    smallStar(largeStar(canonical), dedup = false)
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
      memTruncate: Boolean = false,
      // local union-find contraction before the global loop (see
      // localContract): default ON — it is the 100TB path (shrinks the
      // iterated state and the round count by the local compression
      // ratio) and produces identical exact component ids
      preContract: Boolean = true): DataFrame = {
    // r6 (VERDICT r5 watch item #3): the v5g campaign fix —
    // coalescePartitions.parallelismFirst=false — moves from the campaign
    // envelope into the library: pre-contraction granularity (and with it
    // the star-round count) must depend on DATA size, not on local[N].
    // Scoped save/restore, same pattern as Walk.fetchByVertex.
    graft.engine.Conf.withIterTuning(edges.sparkSession) {
    val verts = GraphOps.vertices(edges)

    val canonical = edges
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("src"),
        greatest(col("src"), col("dst")).as("dst"))

    // preContract consumes the multiset directly (union-find is
    // duplicate-insensitive and the contracted set closes with its own
    // distinct), saving the initial dedup shuffle entirely
    val (state0, mappingOpt) =
      if (preContract) {
        val (c, m) = localContract(canonical)
        (c, Some(m))
      } else (canonical.distinct(), None)

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
    mappingOpt match {
      case Some(mapping) =>
        // compose: v → localRoot → global comp, folded OFF the |V| spine
        // (VERDICT r4 #5 — cc at 4N was compose-join bound): rewrite the
        // SMALL parents set over the mapping once, then the verts spine
        // pays ONE left join instead of two. The union's key sets are
        // disjoint by construction — mapping keys are locally-contracted
        // non-roots (v ≠ root rows only), parents keys are members of
        // the post-contraction star forest (local roots and
        // never-contracted vertices) — so no vertex resolves twice. Both
        // levels carry component minima, so the coalesce chain yields
        // the exact global minimum id.
        val composed = mapping
          .join(parents.withColumnRenamed("v", "r"),
            col("root") === col("r"), "left")
          .select(col("v"), coalesce(col("comp"), col("root")).as("comp"))
          .unionAll(parents)
        verts.join(composed, Seq("v"), "left")
          .select(col("v"), coalesce(col("comp"), col("v")).as("comp"))
      case None =>
        verts.join(parents, Seq("v"), "left")
          .select(col("v"), coalesce(col("comp"), col("v")).as("comp"))
    }
    }
  }
}
