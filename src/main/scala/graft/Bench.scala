package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.algo.{Components, LabelProp, PageRank, Triangles}
import graft.engine.Iterate
import graft.text.TextOps
import graft.walk.Walk

/** Benchmark main (driver contract): runs the headline workload on
  * `SPARK_GRAFT_SF_DIR` at `local[SPARK_GRAFT_CPUS]` and prints ONE JSON
  * line. Headline metric follows BASELINE.json: edges processed/sec over
  * gather-scatter (PageRank power) iterations, plus PageRank
  * time-to-convergence (1e-6) and walk step throughput.
  */
object Bench {

  final case class Result(
      seconds: Map[String, Double],
      edges: Long,
      prIters: Int,
      prSec: Double,
      walkSteps: Long,
      walkSec: Double,
      ccIters: Int,
      ccConverged: Boolean)

  def time[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** The headline workload over one testdata dir. */
  def headline(spark: SparkSession, sfDir: String): Result = {
    var secs = Map[String, Double]()

    val (edges, tDerive) = time {
      val e = SparkEntry.eventEdges(spark, sfDir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      e.count()
      e
    }
    val eCount = edges.count()
    secs += "derive_edges" -> tDerive

    val (_, tPr) = time { PageRank.run(edges, tol = 1e-6, maxIter = 60).count() }
    val prIters = Iterate.lastIterations
    secs += "pagerank_conv" -> tPr

    val (_, tCc) = time { Components.run(edges).count() }
    val ccIters = Iterate.lastIterations
    val ccConverged = Iterate.lastConverged
    secs += "cc" -> tCc

    val (_, tLpa) = time { LabelProp.run(edges, iters = 3).count() }
    secs += "lpa" -> tLpa

    val (_, tTri) = time { Triangles.count(edges).head() }
    secs += "triangles" -> tTri

    val walkLen = 10
    val nWalkers = 20000L
    val (_, tWalk) = time {
      Walk.firstOrder(edges, Walk.equalStarts(edges, nWalkers), maxSteps = walkLen).count()
    }
    secs += "deepwalk" -> tWalk

    // chained is the DEFAULT walk path (collapses L barriers to ~2 rounds);
    // headline walk throughput is its MEASURED step count (walkers die
    // early at zero-out-degree vertices, so nWalkers*walkLen overstates)
    val (chainSteps, tChain) = time {
      Walk.firstOrderChained(edges, Walk.equalStarts(edges, nWalkers), maxSteps = walkLen)
        .count() - nWalkers // steps = footprints minus starts
    }
    secs += "deepwalk_chained" -> tChain

    val (_, tN2v) = time {
      Walk.node2vec(edges, Walk.equalStarts(edges, 5000L), maxSteps = 6,
        p = 2.0, q = 0.5).count()
    }
    secs += "node2vec" -> tN2v

    val (_, tN2vChain) = time {
      Walk.node2vecChained(edges, Walk.equalStarts(edges, 5000L), maxSteps = 6,
        p = 2.0, q = 0.5).count()
    }
    secs += "node2vec_chained" -> tN2vChain
    // NOTE: node2vec_reject is deliberately NOT a bench phase — its
    // ~25 per-trial outer iterations are analysis/codegen/latency
    // dominated at driver-bench scale (~40 s at sf0.001 even after the
    // single-action-per-iteration restructure, vs the exact engine's
    // 2.7 s), which would swamp the per-round bench comparison with
    // overhead, not work. Its scale evidence is the v5s campaign at
    // 32.4M edges (BENCH/BASELINE.md), where real work dominates and
    // the lb/ub join-traffic cut is measured directly.

    // heterogeneous walk: edge types derived from the endpoint parity,
    // two schemes — exercises the typed-CSR chained kernel
    val (_, tMetaChain) = time {
      val typed = edges.withColumn("etype", pmod(col("src") + col("dst"), lit(2)).cast("int"))
      Walk.metapathChained(typed, Walk.equalStarts(edges, 5000L),
        Seq(Seq(Seq(true, false), Seq(true, true)), Seq(Seq(false, true))),
        maxSteps = 6).count()
    }
    secs += "metapath_chained" -> tMetaChain

    // walk phases share the session CSR caches (built once, reused by all
    // four); release them before the text/ANN phases
    Walk.releaseCaches()

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val (_, tLsh) = time { TextOps.minhashLshPairs(docs).count() }
    secs += "minhash_lsh" -> tLsh

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val (_, tAnn) = time {
      graft.ann.Ann.bruteForceTopK(emb, emb.filter(col("vec_id") < 10), k = 5).count()
    }
    secs += "ann_topk" -> tAnn

    // leave the session clean for the next repeat: every repeat pays the
    // same cache builds (only JIT state is shared across repeats)
    edges.unpersist(false)
    Walk.releaseCaches()

    Result(secs, eCount, prIters, tPr, chainSteps, tChain, ccIters, ccConverged)
  }

  /** Median of a sample (lower-middle for even n — a real observed value,
    * not an interpolation). */
  def median(xs: Seq[Double]): Double = xs.sorted.apply((xs.size - 1) / 2)

  def session(cpus: String): SparkSession = session(cpus, cpus.toInt)

  /** Shuffle partitions sized to the DATA, not the cores: a 196k-edge
    * input on 32 cores wastes more on task scheduling than it gains in
    * parallelism (measured: sf0.1 bench 86s at 8 partitions vs 138s at
    * 32). Callers pass the data-derived partition count; AQE still
    * rebalances at runtime. */
  def session(cpus: String, shufflePartitions: Int): SparkSession = SparkSession.builder()
    .master(s"local[$cpus]")
    .appName("graft-bench")
    .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // ~1 shuffle partition per 4 MB of input, clamped to [8, cpus]
    val bytes = java.nio.file.Files.walk(java.nio.file.Paths.get(sfDir))
      .filter(p => p.toString.endsWith(".parquet"))
      .mapToLong(p => java.nio.file.Files.size(p)).sum()
    val parts = math.max(8, math.min(cpus.toInt, (bytes / (4 << 20)).toInt))
    val spark = session(cpus, parts)
    spark.sparkContext.setLogLevel("WARN")
    // repeats + per-query MEDIANS (VERDICT r3 #2): a single sample cannot
    // distinguish VM noise from a real regression — r3's +8-10% "uniform
    // slowdown" included untouched code and reversed on re-measurement
    val repeats = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEATS", "3").toInt
    val runs = (1 to repeats).map { i =>
      System.err.println(s"[graft:bench] repeat $i/$repeats")
      val r = headline(spark, sfDir)
      // per-repeat breakdown on stderr: repeat 1 is the COLD sample
      // (comparable to earlier single-run rounds); later repeats measure
      // the JIT-warm steady state the medians summarize
      System.err.println(f"[graft:bench] repeat $i total=${r.seconds.values.sum}%.2f " +
        r.seconds.toSeq.sortBy(_._1).map { case (k, v) => f"$k=$v%.2f" }.mkString(" "))
      r
    }
    val r = runs.head // structural fields (edges, iters) are deterministic
    val keys = r.seconds.keys.toSeq.sorted
    def med(k: String) = median(runs.map(_.seconds(k)))
    val qs = keys.map(k => f""""$k":${med(k)}%.3f""").mkString("{", ",", "}")
    val qsMin = keys.map(k => f""""$k":${runs.map(_.seconds(k)).min}%.3f""")
      .mkString("{", ",", "}")
    val total = keys.map(med).sum
    val prSecMed = median(runs.map(_.prSec))
    val walkSecMed = median(runs.map(_.walkSec))
    val edgesPerSec = r.edges.toDouble * r.prIters / prSecMed
    val stepsPerSec = r.walkSteps / walkSecMed
    println(
      f"""{"metric":"edges_per_sec_pagerank","value":$edgesPerSec%.0f,"unit":"edges/sec","queries":$qs,"queries_min":$qsMin,"repeats":$repeats,"sf":"$sfDir","total_sec":$total%.2f,"edges":${r.edges},"pagerank_iters":${r.prIters},"pagerank_conv_sec":$prSecMed%.2f,"walk_steps_per_sec":$stepsPerSec%.0f,"cc_iters":${r.ccIters},"cc_converged":${r.ccConverged},"cpus":"$cpus"}""")
    spark.stop()
  }
}
