package graft

import org.apache.spark.sql.functions._
import graft.engine.Iterate
import graft.walk.Walk

/** Mid-walk kill/resume (reference per-epoch path flush,
  * include/walk.hpp:703-844): a durable walk interrupted at step k and
  * re-run with the same store continues from k and produces bitwise the
  * same footprints as an uninterrupted run — the walk RNG keys on
  * (seed, walkerId, step), never on history.
  */
class WalkResumeSpec extends SparkSpec {

  private def fpSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Int, Long)] =
    df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

  test("walk interrupted mid-run resumes to bitwise-identical footprints") {
    val edges = randomEdges(vNum = 60, eNum = 240, seed = 7)
    val starts = Walk.equalStarts(edges, 100)

    val full = fpSet(Walk.firstOrder(edges, starts, maxSteps = 8, seed = 11))

    val root = java.nio.file.Files.createTempDirectory("graft-walk-resume").toString
    val store = new Iterate.CheckpointStore(root, spark)
    // "crash" after 3 steps, then resume with the same store to 8
    Walk.firstOrder(edges, starts, maxSteps = 3, seed = 11,
      store = Some(store), runName = "w")
    val resumed = fpSet(Walk.firstOrder(edges, starts, maxSteps = 8, seed = 11,
      store = Some(store), runName = "w"))

    assert(resumed === full)

    // durable footprints: every step 0..8 has a complete parquet snapshot
    val (hi, _) = store.latest("w").get
    assert(hi === 8)
  }

  test("rejection walk (user Pd + bounds) resumes mid-run bitwise-identically") {
    val edges = randomEdges(vNum = 50, eNum = 250, seed = 21)
    val starts = Walk.equalStarts(edges, 80)
    val pd: (Int, Long, Long, Double) => Double =
      (_, _, dst, _) => if (dst % 2 == 0) 2.0 else 0.5
    val cfg = Walk.TransitionConfig(dynamic = Some(pd))
    val full = fpSet(Walk.genericReject(edges, starts, maxSteps = 6, cfg,
      upper = 2.0, lower = 0.5, seed = 23))
    val root = java.nio.file.Files.createTempDirectory("graft-rej-resume").toString
    val store = new Iterate.CheckpointStore(root, spark)
    // "crash" after 2 steps, then resume with the same store to 6 —
    // the in-row retry loop leaves no trial state across steps, so the
    // step snapshot is the complete durable unit
    Walk.genericReject(edges, starts, maxSteps = 2, cfg,
      upper = 2.0, lower = 0.5, seed = 23, store = Some(store), runName = "rj")
    val resumed = fpSet(Walk.genericReject(edges, starts, maxSteps = 6, cfg,
      upper = 2.0, lower = 0.5, seed = 23, store = Some(store), runName = "rj"))
    assert(resumed === full)
    assert(store.latest("rj").get._1 === 6)
  }

  test("second-order walk resumes mid-run bitwise-identically (prevV state persisted)") {
    val edges = randomEdges(vNum = 50, eNum = 250, seed = 9)
    val starts = Walk.equalStarts(edges, 80)
    val full = fpSet(Walk.node2vec(edges, starts, maxSteps = 6, p = 2.0, q = 0.5, seed = 17))

    val root = java.nio.file.Files.createTempDirectory("graft-n2v-resume").toString
    val store = new Iterate.CheckpointStore(root, spark)
    Walk.node2vec(edges, starts, maxSteps = 2, p = 2.0, q = 0.5, seed = 17,
      store = Some(store), runName = "n2v")
    val resumed = fpSet(Walk.node2vec(edges, starts, maxSteps = 6, p = 2.0, q = 0.5, seed = 17,
      store = Some(store), runName = "n2v"))
    assert(resumed === full)
  }

  /** Simulate a mid-walk kill for the CHAINED kernels: run the durable
    * walk to completion, then delete every round above `keep` from the
    * store — exactly the state a kill at round-`keep`'s barrier leaves
    * behind (later rounds have no _SUCCESS / don't exist). */
  private def truncateStore(store: Iterate.CheckpointStore, name: String, keep: Int): Unit = {
    val (hi, _) = store.latest(name).get
    assert(hi > keep, s"walk finished in <= $keep rounds — can't simulate a kill after $keep")
    val conf = spark.sparkContext.hadoopConfiguration
    ((keep + 1) to hi).foreach { r =>
      val p = new org.apache.hadoop.fs.Path(store.iterPath(name, r))
      p.getFileSystem(conf).delete(p, true)
    }
  }

  test("chained walk kill/resume is bitwise-identical (round-durable)") {
    val edges = randomEdges(vNum = 60, eNum = 240, seed = 7)
    val starts = Walk.equalStarts(edges, 120)
    // tailThreshold 0 forces multiple cogroup rounds (the durable units);
    // footprints are execution-path-invariant, so comparing against the
    // default-path run also re-checks tail parity
    val full = fpSet(Walk.firstOrderChained(edges, starts, maxSteps = 10, seed = 11,
      buckets = 4))

    val root = java.nio.file.Files.createTempDirectory("graft-chain-resume").toString
    val store = new Iterate.CheckpointStore(root, spark)
    fpSet(Walk.firstOrderChained(edges, starts, maxSteps = 10, seed = 11, buckets = 4,
      tailThreshold = 0L, store = Some(store), runName = "cw"))
    truncateStore(store, "cw", keep = 1)
    val resumed = fpSet(Walk.firstOrderChained(edges, starts, maxSteps = 10, seed = 11,
      buckets = 4, tailThreshold = 0L, store = Some(store), runName = "cw"))
    assert(resumed === full)

    // a resume with a different horizon must fail loudly — chained round
    // contents depend on maxSteps (walkers stop chaining at the horizon)
    val e = intercept[IllegalArgumentException] {
      Walk.firstOrderChained(edges, starts, maxSteps = 12, seed = 11, buckets = 4,
        store = Some(store), runName = "cw")
    }
    assert(e.getMessage.contains("stored params"))
  }

  test("chained node2vec kill/resume is bitwise-identical (prevNbrs state persisted)") {
    val edges = randomEdges(vNum = 50, eNum = 250, seed = 9)
    val starts = Walk.equalStarts(edges, 90)
    val full = fpSet(Walk.node2vecChained(edges, starts, maxSteps = 8, p = 2.0, q = 0.5,
      seed = 17, buckets = 4))

    val root = java.nio.file.Files.createTempDirectory("graft-n2vchain-resume").toString
    val store = new Iterate.CheckpointStore(root, spark)
    fpSet(Walk.node2vecChained(edges, starts, maxSteps = 8, p = 2.0, q = 0.5, seed = 17,
      buckets = 4, crosserCap = 4, tailThreshold = 0L,
      store = Some(store), runName = "n2vc"))
    truncateStore(store, "n2vc", keep = 1)
    // resume under a DIFFERENT crosserCap/tailThreshold: execution-shape
    // knobs, not semantics — footprints must still be bitwise-identical
    val resumed = fpSet(Walk.node2vecChained(edges, starts, maxSteps = 8, p = 2.0, q = 0.5,
      seed = 17, buckets = 4, store = Some(store), runName = "n2vc"))
    assert(resumed === full)
  }

  test("chained stateful kill/resume round-trips typed state through the store") {
    val edges = randomEdges(vNum = 60, eNum = 300, seed = 21)
    val starts = Walk.equalStarts(edges, 100)
    implicit val enc = org.apache.spark.sql.Encoders.scalaLong
    val cfg = Walk.StatefulConfig[Long](
      init = (wid, v) => wid * 31L + v,
      extension = (_, st, _) => if (st % 11 == 0) 0.0 else 0.9,
      bias = (_, _, _, _, _, _) => 1.0,
      update = (st, _, _, nxt) => st * 1099511628211L + nxt)
    def fp4(df: org.apache.spark.sql.DataFrame) =
      df.select(col("walkerId"), col("step"), col("vertex"), col("state"))
        .as[(Long, Int, Long, Long)](org.apache.spark.sql.Encoders
          .tuple(enc, org.apache.spark.sql.Encoders.scalaInt, enc, enc))
        .collect().toSet
    val full = fp4(Walk.genericStatefulChained(edges, starts, maxSteps = 8, cfg, seed = 29,
      buckets = 4))

    val root = java.nio.file.Files.createTempDirectory("graft-gsc-resume").toString
    val store = new Iterate.CheckpointStore(root, spark)
    fp4(Walk.genericStatefulChained(edges, starts, maxSteps = 8, cfg, seed = 29,
      buckets = 4, tailThreshold = 0L, store = Some(store), runName = "gsc"))
    truncateStore(store, "gsc", keep = 1)
    val resumed = fp4(Walk.genericStatefulChained(edges, starts, maxSteps = 8, cfg, seed = 29,
      buckets = 4, tailThreshold = 0L, store = Some(store), runName = "gsc"))
    assert(resumed === full)
  }

  test("chained metapath kill/resume is bitwise-identical (schemeId persisted)") {
    val edges = randomEdges(vNum = 60, eNum = 300, seed = 23)
      .withColumn("etype", pmod(col("src") + col("dst"), lit(3)).cast("int"))
    val schemes = Seq(
      Seq(Seq(true, false, true), Seq(false, true, true)),
      Seq(Seq(true, true, false)))
    val starts = Walk.equalStarts(edges, 100)
    val full = fpSet(Walk.metapathChained(edges, starts, schemes, maxSteps = 8, seed = 37,
      buckets = 4))

    val root = java.nio.file.Files.createTempDirectory("graft-mpc-resume").toString
    val store = new Iterate.CheckpointStore(root, spark)
    fpSet(Walk.metapathChained(edges, starts, schemes, maxSteps = 8, seed = 37,
      buckets = 4, tailThreshold = 0L, store = Some(store), runName = "mpc"))
    truncateStore(store, "mpc", keep = 1)
    val resumed = fpSet(Walk.metapathChained(edges, starts, schemes, maxSteps = 8, seed = 37,
      buckets = 4, tailThreshold = 0L, store = Some(store), runName = "mpc"))
    assert(resumed === full)
  }

  test("portable-RNG walk is deterministic and matches the fast variant's shape") {
    val edges = randomEdges(vNum = 40, eNum = 160, seed = 5)
    val starts = Walk.equalStarts(edges, 50)
    val a = fpSet(Walk.firstOrder(edges, starts, maxSteps = 6, seed = 3, portableRng = true))
    val b = fpSet(Walk.firstOrder(edges, starts, maxSteps = 6, seed = 3, portableRng = true))
    assert(a === b)
    // same walker set and per-walker monotone steps as the fast variant
    val fast = fpSet(Walk.firstOrder(edges, starts, maxSteps = 6, seed = 3))
    assert(a.map(_._1) === fast.map(_._1))
  }
}
