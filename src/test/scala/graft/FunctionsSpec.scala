package graft

import org.apache.spark.sql.functions._
import graft.functions.AliasSampleExpr

/** Native codegen'd expressions vs reference implementations. */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("AliasSampleExpr == driver-side alias draw on random tables, codegen path") {
    val rnd = new scala.util.Random(83)
    val rows = (0 until 500).map { i =>
      val n = 1 + rnd.nextInt(20)
      val wts = Array.fill(n)(1.0 + rnd.nextInt(5))
      val (prob, alias) = graft.graph.GraphOps.buildAlias(wts)
      val nbrs = Array.tabulate(n)(k => (i * 100 + k).toLong)
      (i.toLong, nbrs, prob, alias, rnd.nextDouble(), rnd.nextDouble())
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-fn").toString
    rows.toDF("id", "nbrs", "prob", "alias", "r1", "r2")
      .write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val got = df.select(col("id"),
        AliasSampleExpr.sample(col("nbrs"), col("prob"), col("alias"), col("r1"), col("r2")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (id, nbrs, prob, alias, r1, r2) =>
      val n = nbrs.length
      val i = math.min((r1 * n).toInt, n - 1)
      val exp = if (r2 < prob(i)) nbrs(i) else nbrs(alias(i))
      assert(got(id) === exp, s"row $id")
    }
    // sql registration path
    AliasSampleExpr.register(spark)
    val viaSql = df.selectExpr("id", "alias_sample(nbrs, prob, alias, r1, r2) AS s")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql === got)
    // stays inside whole-stage codegen (no UDF/BatchEvalPython breaks)
    val plan = df.select(AliasSampleExpr.sample(col("nbrs"), col("prob"),
      col("alias"), col("r1"), col("r2"))).queryExecution.executedPlan.toString
    assert(plan.contains("*("), plan) // "*(n)" prefix = inside WholeStageCodegen stage n
  }

  test("AliasSampleExpr null propagation") {
    val df = Seq((Some(Array(1L, 2L)), Array(1.0, 1.0), Array(0, 1), 0.3, 0.9),
        (None, Array(1.0), Array(0), 0.1, 0.1))
      .toDF("nbrs", "prob", "alias", "r1", "r2")
    val out = df.select(AliasSampleExpr.sample(col("nbrs"), col("prob"),
      col("alias"), col("r1"), col("r2")).as("s")).collect()
    assert(!out(0).isNullAt(0))
    assert(out(1).isNullAt(0))
  }
}
