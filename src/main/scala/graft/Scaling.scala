package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.algo.{Components, PageRank}
import graft.derive.Derive
import graft.engine.{Iterate, TaskMetricsListener}
import graft.synth.Synth
import graft.walk.Walk

/** North-rule scaling protocol (no real cluster in this sandbox): run the
  * identical workload at two parallelism levels — local[N] and local[4N] —
  * on the same input and report throughput at both plus
  * `efficiency = (T_N / T_4N) / 4` into BENCH/BASELINE.md.
  *
  * Each level runs in a fresh child JVM pinned with
  * `-XX:ActiveProcessorCount=N`: local[N] alone still lets GC, codegen
  * compilation, and fork-join pools use all 32 host cores, which makes the
  * N-level artificially fast relative to a true N-core host and understates
  * efficiency. Pinning makes level N behave like an N-core machine — the
  * thing the protocol is a proxy for.
  *
  * Per-phase task metrics (CPU time, GC time, shuffle bytes) are collected
  * as evidence for WHY a phase scales or doesn't (VERDICT r1 asked for
  * this): cpu-sec ≈ equal across levels ⇒ same work, wall gap = scheduling
  * or memory stalls; shuffle MB shows the exchange volume.
  *
  * Input: the deterministic synthetic transcript corpus (seed 42), sized
  * so compute dominates fixed per-job overhead — the driver testdata sfs
  * are too small for a meaningful core-scaling measurement.
  *
  * Usage: runMain graft.Scaling [nConvs] [N] [outFile]
  */
object Scaling {

  final case class Phase(name: String, sec: Double, work: Long, workUnit: String,
      cpuSec: Double, gcSec: Double, shufMb: Double)

  /** Optional phase filter: `SPARK_GRAFT_PHASES=pagerank_10it,cc_conv`
    * runs only the named phases (derive_edges always executes — it
    * produces the input — but is only TIMED/reported when named). Both
    * spawned levels inherit the parent's environment, so the filter is
    * level-symmetric by construction. Purpose: repeat-sampling a single
    * phase for medians on a host whose service swings per child (the
    * round-5 variance record in BENCH/BASELINE.md) — a full-workload
    * pair costs 20-60 min, a one-phase pair ~5-15. */
  private def phaseFilter: Option[Set[String]] =
    sys.env.get("SPARK_GRAFT_PHASES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)

  def workload(spark: SparkSession, nConvs: Long): Seq[Phase] = {
    import Bench.time
    val buf = scala.collection.mutable.ArrayBuffer[Phase]()
    val enabled: String => Boolean = n => phaseFilter.forall(_.contains(n))
    val listener = new TaskMetricsListener
    spark.sparkContext.addSparkListener(listener)
    var last = listener.snap(spark.sparkContext)
    def phase[T](name: String, workUnit: String)(f: => (T, Long)): Unit = {
      if (!enabled(name)) return
      val ((_, work), sec) = time(f)
      val now = listener.snap(spark.sparkContext)
      val d = now - last
      last = now
      buf += Phase(name, sec, work, workUnit, d.cpuSec, d.gcSec, d.shufReadMb + d.shufWriteMb)
    }

    val edges = {
      val turns = Synth.transcripts(spark, nConvs)
      val withVid = Derive.withDenseVid(turns)
      Derive.edges(withVid)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    phase("derive_edges", "edges") { (edges, edges.count()) }
    val m = edges.count()
    // re-baseline ONLY when derive ran untimed (filtered run), so its
    // cpu/gc/shuffle doesn't leak into the first timed phase; in the
    // full-workload case the snapshot stays exactly where every prior
    // campaign left it (metric attribution must stay comparable).
    if (!enabled("derive_edges")) last = listener.snap(spark.sparkContext)

    // fixed iteration counts where possible: identical work at both levels
    phase("pagerank_10it", "edge-visits") {
      (PageRank.run(edges, fixedIter = Some(10)).count(), m * 10)
    }

    // CC runs to the star fixpoint (deterministic round count — identical
    // at both levels); work is approximate (the edge set shrinks per round)
    phase("cc_conv", "edge-visits") {
      (Components.run(edges).count(),
        m * Iterate.lastIterations * Components.RoundsPerIteration)
    }

    val nWalkers = math.max(10000L, nConvs)
    val walkLen = 10
    val anyWalk = Seq("deepwalk_chained", "node2vec_chained",
      "stateful_chained").exists(enabled)
    // NOTE: starts materializes OUTSIDE any phase() and its metrics land
    // in the next timed phase's delta, exactly as in every prior
    // campaign (attribution comparability); filtered runs without a walk
    // phase skip the build entirely.
    lazy val starts = {
      val s = Walk.equalStarts(edges, nWalkers)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      s.count()
      s
    }
    if (anyWalk) starts
    // chained is the engine's default walk path (firstOrder remains in
    // Bench for the per-step-join comparison)
    // protocol v3: the chained kernels default nBuckets to
    // defaultParallelism*2, which would make the N level run a DIFFERENT
    // kernel than the 4N level (4 vs 16 buckets — bigger per-task CSR
    // maps, different crosser sets) — the same plan-inconstancy class v2
    // fixed for shuffle partitions. Fix the bucket count like the
    // partition count: 32 at every level.
    phase("deepwalk_chained", "steps") {
      val n = Walk.firstOrderChained(edges, starts, maxSteps = walkLen,
        buckets = 32).count() - nWalkers
      ((), n)
    }
    // second-order chained kernel (VERDICT r3 #5: all prior scale evidence
    // was first-order; the reference's headline table is node2vec-heavy).
    // Same walker count as deepwalk: the first v3 campaign ran nConvs/4
    // and the phase was too small to measure (18.5 s at N with ~6 s of
    // fixed per-job latency ⇒ efficiency capped at ~0.6 by overhead).
    phase("node2vec_chained", "steps") {
      val n = Walk.node2vecChained(edges, starts, maxSteps = walkLen,
        p = 2.0, q = 0.5, buckets = 32).count() - nWalkers
      ((), n)
    }
    // typed-state chained engine (VERDICT r4 #6: the stateful surface —
    // the reference's arbitrary walker_data_t — had zero N→4N evidence).
    // State = 64-bit rolling hash; Pe and the dynamic bias both read it,
    // so the phase exercises state-dependent termination + Pd through the
    // chained cogroup kernel, including its run-local CSR build.
    phase("stateful_chained", "steps") {
      implicit val enc = org.apache.spark.sql.Encoders.scalaLong
      val cfg = Walk.StatefulConfig[Long](
        init = (wid, v) => wid * 1099511628211L + v,
        extension = (_, st, _) =>
          if (java.lang.Long.remainderUnsigned(st, 17L) == 0L) 0.0 else 0.97,
        bias = (_, st, _, dst, _, _) => if (((st ^ dst) & 1L) == 0L) 1.0 else 0.5,
        update = (st, _, _, nxt) => st * 1099511628211L + nxt)
      val n = Walk.genericStatefulChained(edges, starts, maxSteps = walkLen, cfg,
        buckets = 32).count() - nWalkers
      ((), n)
    }
    // rejection-sampling second-order engine (round 5 — the dartboard
    // alternative to the exact-joins path; zero N→4N evidence before
    // this phase). p=0.5 puts 1/p above ub = max(1, 1/q) so the
    // return-edge outlier appendix is live: the phase exercises dart
    // pre-accepts, the appendix, AND the partial membership join — the
    // only shuffle that grows with prevV neighbourhoods; the engine's
    // scale claim is that ≥ lb/ub of proposals skip it entirely.
    // Own start set (nConvs/2 walkers, 6 steps — per-trial join rounds
    // cost ~2× the per-step join engine): built just before the phase,
    // so in a filtered single-phase run its build lands in this phase's
    // delta (self-contained attribution, like the starts→deepwalk rule).
    if (enabled("node2vec_reject")) {
      val nRej = math.max(10000L, nConvs / 2)
      val rejStarts = Walk.equalStarts(edges, nRej)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      rejStarts.count()
      phase("node2vec_reject", "steps") {
        val n = Walk.node2vecReject(edges, rejStarts, maxSteps = 6,
          p = 0.5, q = 2.0).count() - nRej
        ((), n)
      }
      rejStarts.unpersist(false)
    }
    // metapath chained engine (round 5: the metapath family had zero
    // N→4N evidence — r4 VERDICT "what's missing" #4 named it or the
    // stateful engine; stateful landed in v4, this closes metapath).
    // Edge types are derived deterministically ((src+dst) mod 3, the
    // ChainSpec construction), so work is level-constant; two schemes
    // alternate by walkerId, masks chosen so every position admits at
    // least one live etype (scheme death still occurs where a vertex
    // lacks edges of the allowed types — that is the Pe semantics the
    // phase must include). Gated: not part of the historical workload
    // envelope (campaign comparability).
    if (enabled("metapath_chained")) {
      val tedges = edges.withColumn("etype",
          pmod(col("src") + col("dst"), lit(3)).cast("int"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      tedges.count()
      val mpStarts = Walk.equalStarts(edges, nWalkers)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      mpStarts.count()
      val schemes = Seq(
        Seq(Seq(true, false, true), Seq(false, true, true)),
        Seq(Seq(true, true, false)))
      phase("metapath_chained", "steps") {
        val n = Walk.metapathChained(tedges, mpStarts, schemes,
          maxSteps = walkLen, buckets = 32).count() - nWalkers
        ((), n)
      }
      mpStarts.unpersist(false)
      tedges.unpersist(false)
    }
    if (anyWalk) starts.unpersist(false)
    edges.unpersist()
    // release the session CSR/start-index caches so the compute-dense
    // phase below runs with the same memory budget at every level
    Walk.releaseCaches()

    if (enabled("ann_cosine_all_pairs")) {
      // compute-dense phase (FLOP-bound, not memory-bandwidth-bound):
      // brute-force cosine over deterministic synthetic embeddings
      val nVecs = 8000
      val dim = 64
      val emb = spark.range(nVecs).select(col("id").as("vec_id"),
          array((0 until dim).map(d =>
            Synth.hashRand(lit(77L), col("id"), lit(d)).cast("float")): _*).as("embedding"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      emb.count()
      phase("ann_cosine_all_pairs", "pairs") {
        val n = graft.ann.Ann.bruteForceNearDupPairs(emb, threshold = -2.0).count()
        ((), n)
      }
      emb.unpersist(false)
    }
    buf.toSeq
  }

  /** Child mode: run one parallelism level in THIS JVM and dump phases as
    * TSV. Each level runs in a fresh JVM so the 4N measurement doesn't
    * inherit the N run's JIT warmup / populated caches (measured: shared-
    * JVM runs skew efficiency upward).
    *
    * Shuffle partitions are FIXED (data-sized, 32 for the 33M-edge
    * corpus) at every level — the r2/r3-campaign protocol derived them
    * from the core count, which made the N level run a DIFFERENT plan
    * than the 4N level: at 1 shuffle partition the partial aggregations
    * collapse everything map-side (pagerank shuffled 7.6 GB at local[1]
    * vs 13.0 GB at local[4]), so the 4N level did measurably more work
    * and "efficiency" conflated plan-work inflation with core scaling.
    * A cluster holds the plan constant and scales executors; so does
    * this protocol now. */
  private def childMain(nConvs: Long, cpus: Int, out: String): Unit = {
    val spark = Bench.session(cpus.toString, 32)
    spark.sparkContext.setLogLevel("WARN")
    val phases = try workload(spark, nConvs) finally spark.stop()
    val tsv = phases.map(p =>
      s"${p.name}\t${p.sec}\t${p.work}\t${p.workUnit}\t${p.cpuSec}\t${p.gcSec}\t${p.shufMb}")
      .mkString("\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), tsv)
  }

  private def spawn(nConvs: Long, cpus: Int, out: String): Seq[Phase] = {
    val jcmd = Seq(
      s"${System.getProperty("java.home")}/bin/java") ++
      java.lang.management.ManagementFactory.getRuntimeMXBean.getInputArguments
        .toArray.map(_.toString).filter(a => a.startsWith("--add-opens") || a.startsWith("-Xmx") || a.startsWith("-XX") || a.startsWith("-D")) ++
      Seq(s"-XX:ActiveProcessorCount=$cpus", // emulate an N-core host (see scaladoc)
        "-cp", System.getProperty("java.class.path"),
        "graft.Scaling", "--child", nConvs.toString, cpus.toString, out)
    System.err.println(s"[graft:scaling] spawning level cpus=$cpus")
    val p = new ProcessBuilder(jcmd: _*).inheritIO().start()
    require(p.waitFor() == 0, s"child failed at cpus=$cpus")
    scala.io.Source.fromFile(out).getLines().map { l =>
      val Array(name, sec, work, unit, cpu, gc, shuf) = l.split("\t")
      Phase(name, sec.toDouble, work.toLong, unit, cpu.toDouble, gc.toDouble, shuf.toDouble)
    }.toSeq
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("--child")) {
      childMain(args(1).toLong, args(2).toInt, args(3))
      return
    }
    val nConvs = if (args.length > 0) args(0).toLong else 150000L
    val n = if (args.length > 1) args(1).toInt else 8
    val out = if (args.length > 2) args(2) else "BENCH/BASELINE.md"

    // SPARK_GRAFT_4N_FIRST=1 swaps the child RUN ORDER (report columns
    // unchanged). Diagnostic for host-service decay: every child is
    // identical deterministic work, so if 4N-stall samples follow the
    // SECOND slot rather than the wider level, the stall is
    // time-dependent throttling of a long-running host, not a property
    // of parallelism.
    val swap = sys.env.get("SPARK_GRAFT_4N_FIRST").contains("1")
    val (rN, r4N) = if (swap) {
      val b = spawn(nConvs, 4 * n, s"/tmp/graft-scaling-${4 * n}.tsv")
      val a = spawn(nConvs, n, s"/tmp/graft-scaling-$n.tsv")
      (a, b)
    } else {
      val a = spawn(nConvs, n, s"/tmp/graft-scaling-$n.tsv")
      val b = spawn(nConvs, 4 * n, s"/tmp/graft-scaling-${4 * n}.tsv")
      (a, b)
    }

    val tN = rN.map(_.sec).sum
    val t4N = r4N.map(_.sec).sum
    val eff = (tN / t4N) / 4.0

    val rows = rN.zip(r4N).map { case (a, b) =>
      f"| ${a.name} | ${a.sec}%.1f | ${b.sec}%.1f | ${(a.sec / b.sec) / 4.0}%.3f | ${a.work / a.sec}%.0f → ${b.work / b.sec}%.0f ${a.workUnit}/s | ${a.cpuSec}%.0f → ${b.cpuSec}%.0f | ${a.gcSec}%.0f → ${b.gcSec}%.0f | ${a.shufMb}%.0f → ${b.shufMb}%.0f |"
    }.mkString("\n")

    val md =
      f"""# BENCH — measured throughput and N→4N scaling (this sandbox)
         |
         |Protocol (BASELINE.md / BASELINE.json): identical workload at two
         |parallelism levels on the same deterministic input (synthetic
         |transcript corpus, seed 42, $nConvs conversations), one fresh
         |child JVM per level: `local[$n]` pinned to
         |`-XX:ActiveProcessorCount=$n` (N) vs `local[${4 * n}]` pinned to
         |${4 * n} (4N); `efficiency = (T_N / T_4N) / 4`. The pin makes each
         |level behave like a machine with that many cores (GC, codegen and
         |JVM pools included) — without it the N level borrows the idle 3N
         |cores for auxiliary work and the ratio understates true scaling.
         |Caveat: still a single-host core-scaling proxy for executor
         |scaling — shuffles are in-memory, so this measures CPU
         |scalability of the plans, not network behaviour.
         |
         |**Total: ${tN}%.1f s @ local[$n] → ${t4N}%.1f s @ local[${4 * n}] — scaling efficiency ${eff}%.3f** (target ≥ 0.8)
         |
         || phase | local[$n] s | local[${4 * n}] s | efficiency | throughput N → 4N | cpu-sec N → 4N | gc-sec N → 4N | shuffle MB N → 4N |
         || --- | --- | --- | --- | --- | --- | --- | --- |
         |$rows
         |
         |## Reading the evidence columns
         |
         |- **cpu-sec** (task executor CPU time, summed): equal across
         |  levels ⇒ the plans do identical work and the wall-clock gap is
         |  scheduling/latency, not extra computation. Inflated at 4N ⇒
         |  memory-stall time (stalls are charged to CPU) — the
         |  single-socket DRAM-bandwidth ceiling.
         |- **gc-sec**: GC pressure per level (pinned GC threads).
         |- **shuffle MB**: exchange volume actually moved; identical across
         |  levels by construction (deterministic plans), shown as a sanity
         |  check and for the per-phase cost model.
         |""".stripMargin

    val p = java.nio.file.Paths.get(out)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.writeString(p, md)
    println(md)
  }
}
