package graft.tools

import org.apache.spark.sql.functions._
import graft.algo.Components
import graft.derive.Derive
import graft.engine.Iterate
import graft.synth.Synth

/** A/B harness for connected-components variants at a given corpus size:
  * `runMain graft.tools.CcBench [nConvs] [variant...]` where variants are
  * `dedup` (distinct closes each round), `nodedup` (pure
  * groupBy+join rounds, multiset state), and `-mem` suffixed variants
  * (in-memory SER truncation instead of temp-parquet). */
object CcBench {
  def main(args: Array[String]): Unit = {
    val nConvs = if (args.length > 0) args(0).toLong else 300000L
    val variants = if (args.length > 1) args.drop(1).toSeq else Seq("dedup", "nodedup")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val parts = sys.env.getOrElse("SPARK_GRAFT_PARTS", cpus).toInt
    val spark = graft.Bench.session(cpus, parts)
    spark.sparkContext.setLogLevel("WARN")
    val edges = Derive.edges(Derive.withDenseVid(Synth.transcripts(spark, nConvs)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val m = edges.count()
    System.err.println(s"[ccbench] edges=$m")
    variants.foreach { v =>
      val t0 = System.nanoTime()
      val n = Components.run(edges, runName = s"cc-$v",
        smallDedup = v == "dedup", memTruncate = v.endsWith("mem")).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[ccbench] variant=$v rows=$n iters=${Iterate.lastIterations} sec=$sec%.1f")
    }
    spark.stop()
  }
}
