package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    println("=== derivation (edges) ===")
    graft.SparkEntry.eventEdges(spark, dir).explain("formatted")
    println("=== degrees ===")
    graft.graph.GraphOps.degrees(graft.SparkEntry.eventEdges(spark, dir)).explain("formatted")
    spark.stop()
  }
}
