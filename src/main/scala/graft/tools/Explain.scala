package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dump the physical plans of the engine's key queries into PLANS.md —
  * the plan-review artifact (filters pushed, broadcasts chosen, codegen
  * spans). Usage: runMain graft.tools.Explain [outFile]. */
object Explain {
  def main(args: Array[String]): Unit = {
    val out = if (args.length > 0) args(0) else "PLANS.md"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val sb = new StringBuilder

    def section(title: String, note: String, df: org.apache.spark.sql.DataFrame): Unit = {
      sb.append(s"\n## $title\n\n$note\n\n```\n")
      sb.append(df.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode))
      sb.append("\n```\n")
    }

    sb.append("""# PLANS — physical plans of the headline queries (sf0.001)
                |
                |Things to check in each plan: parquet `PushedFilters`/pruned
                |`ReadSchema`, broadcast vs shuffle join choices, `*(n)` whole-stage
                |codegen spans around the hot expressions, and AQE wrappers.
                |""".stripMargin)

    val edges = graft.SparkEntry.eventEdges(spark, dir)
    section("transcript → edge derivation",
      "One window pass for succession/reply/skip (single scan+exchange per window family), " +
        "tool chains on their own partitioning, final partial+final hash agg for weights.",
      edges)

    section("degrees",
      "Two hash aggregations merged by a single full-outer join; partial aggregation " +
        "happens map-side before each exchange.",
      graft.graph.GraphOps.degrees(edges).toDF())

    val trans = edges.join(edges.groupBy(col("src")).agg(sum("weight").as("ow")), "src")
      .select(col("src"), col("dst"), (col("weight") / col("ow")).as("p"))
    val ranks = graft.graph.GraphOps.vertices(edges)
      .select(col("v"), lit(false).as("hasOut"), lit(0.001).as("rank"))
    val dangling = ranks.filter(!col("hasOut")).agg(coalesce(sum("rank"), lit(0.0)).as("dmass"))
    section("PageRank single iteration (shape)",
      "The per-iteration job: dangling mass enters as a broadcast 1-row cross join " +
        "(BroadcastNestedLoopJoin over a scalar), contributions aggregate partial/final " +
        "on dst, rank vector joins back. In the real loop `trans` is cached+pre-partitioned " +
        "by src, so only the small rank vector shuffles each iteration.",
      trans.join(ranks.select(col("v").as("src"), col("rank")), Seq("src"))
        .groupBy(col("dst").as("v")).agg(sum(col("p") * col("rank")).as("c"))
        .crossJoin(broadcast(dangling)))

    section("triangle count",
      "Oriented dedup → wedge self-join → left-semi close. The semi-join keeps the " +
        "existence probe from materializing wedge×edge pairs.",
      graft.algo.Triangles.count(edges))

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    section("ANN brute-force top-k",
      "Query set broadcast (BroadcastNestedLoopJoin on the <10-row side); cosine is " +
        "higher-order functions (zip_with/aggregate) inside codegen — no UDF row boundary.",
      graft.ann.Ann.bruteForceTopK(emb, emb.filter(col("vec_id") < 10), k = 5))

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    section("MinHash-LSH candidate pairs",
      "Banded signatures explode → bucket self-join (hash join on band+bucket, never a " +
        "cross join) → exact signature-similarity verify.",
      graft.text.TextOps.minhashLshPairs(docs))

    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), sb.toString)
    println(s"wrote $out")
    spark.stop()
  }
}
