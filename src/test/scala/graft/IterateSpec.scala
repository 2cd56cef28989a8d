package graft

import org.apache.spark.sql.functions._
import graft.algo.PageRank
import graft.engine.Iterate

/** Checkpoint/resume + lineage fixture (FIXTURES.md §7). */
class IterateSpec extends SparkSpec {

  test("PageRank resumes from checkpoint bitwise-identically") {
    val df = randomEdges(vNum = 80, eNum = 320, seed = 21)
    val full = PageRank.run(df, fixedIter = Some(8))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    val root = java.nio.file.Files.createTempDirectory("graft-ckpt-spec").toString
    val store = new Iterate.CheckpointStore(root, spark)
    // run 4 iterations, "crash", then resume with the same store to 8
    PageRank.run(df, fixedIter = Some(4), store = Some(store), runName = "pr")
    val resumed = PageRank.run(df, fixedIter = Some(8), store = Some(store), runName = "pr")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(resumed === full) // deterministic math => bitwise equal

    // lineage rows: one per (iteration, partition), iterations 0..8 present
    val lineage = store.lineage("pr")
    val iters = lineage.select("iter").distinct().collect().map(_.getInt(0)).sorted
    assert(iters.sameElements(0 to 8))
    assert(lineage.groupBy("iter", "partId").count().filter(col("count") > 1).isEmpty)
    // skew metric derivable and finite
    val skew = store.skew("pr").collect().map(_.getDouble(1))
    assert(skew.forall(s => s >= 1.0 && !s.isNaN))
  }

  test("resume skips completed iterations (no recompute of iter<=k)") {
    val root = java.nio.file.Files.createTempDirectory("graft-ckpt-spec2").toString
    val store = new Iterate.CheckpointStore(root, spark)
    import spark.implicits._
    val s0 = Seq((0L, 0L)).toDF("v", "x")
    var calls = 0
    def step(df: org.apache.spark.sql.DataFrame, i: Int) = { calls += 1; df.withColumn("x", col("x") + 1) }
    Iterate.run("r", s0, step, fixedIter = Some(3), store = Some(store))
    assert(calls === 3)
    calls = 0
    val out = Iterate.run("r", s0, step, fixedIter = Some(5), store = Some(store))
    assert(calls === 2) // only iterations 4 and 5 ran
    assert(out.select("x").head().getLong(0) === 5L)
  }
}
