package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session + seeded-random graph fixtures for all suites
  * (FIXTURES.md §4: reference-style simple graphs, no self-loops, no
  * duplicate edges, weights in [1,5]). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  import org.apache.spark.sql.DataFrame

  /** Deterministic simple random digraph as an edge DataFrame. */
  def randomEdges(vNum: Int, eNum: Int, seed: Long, weighted: Boolean = true): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val seen = scala.collection.mutable.Set[(Long, Long)]()
    val rows = scala.collection.mutable.ArrayBuffer[(Long, Long, Double)]()
    while (rows.size < eNum && rows.size < vNum.toLong * (vNum - 1)) {
      val s = rnd.nextInt(vNum).toLong
      val d = rnd.nextInt(vNum).toLong
      if (s != d && !seen((s, d))) {
        seen += ((s, d))
        rows += ((s, d, if (weighted) (1 + rnd.nextInt(5)).toDouble else 1.0))
      }
    }
    import spark.implicits._
    rows.toSeq.toDF("src", "dst", "weight")
  }

  def collectEdges(df: DataFrame): Seq[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
