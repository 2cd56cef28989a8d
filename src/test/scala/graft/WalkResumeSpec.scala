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
