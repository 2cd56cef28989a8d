package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc debug runner: `runMain graft.tools.Debug <queryName> <sfDir>`. */
object Debug {
  def main(args: Array[String]): Unit = {
    val q = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val df = graft.SparkEntry.queries(q)(spark, sfDir)
    println(s"rows=${df.count()} wall=${(System.nanoTime() - t0) / 1e9}s")
    df.show(5, false)
    spark.stop()
  }
}
