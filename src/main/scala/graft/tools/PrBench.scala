package graft.tools
import org.apache.spark.sql.SparkSession
object PrBench {
  def main(args: Array[String]): Unit = {
    val cpus = args(0)
    val nConvs = args(1).toLong
    val spark = graft.Bench.session(cpus)
    spark.sparkContext.setLogLevel("WARN")
    val turns = graft.synth.Synth.transcripts(spark, nConvs)
    val withVid = graft.derive.Derive.withDenseVid(turns)
    val e = graft.derive.Derive.edges(withVid).persist()
    println(s"edges=${e.count()}")
    val t0 = System.nanoTime()
    graft.algo.PageRank.run(e, fixedIter = Some(10)).count()
    println(f"pagerank10 ${(System.nanoTime()-t0)/1e9}%.1f s at local[$cpus]")
    spark.stop()
  }
}
