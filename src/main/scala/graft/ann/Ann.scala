package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`):
  * brute-force cosine top-k as the exact baseline, and a random-
  * hyperplane LSH-bucketed variant as the scale path (candidates come
  * from bucket groups — no n² cross join at scale).
  */
object Ann {

  /** Cosine similarity between two array columns via higher-order
    * functions (codegen'd; no UDF). */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Exact brute-force top-k cosine neighbours for the given query rows.
    * Broadcast the (small) query set against the corpus — one pass, no
    * shuffle of the corpus. */
  def bruteForceTopK(
      corpus: DataFrame,       // (vec_id, embedding)
      queries: DataFrame,      // (vec_id, embedding)
      k: Int = 5): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("query_id"), col("embedding").as("qe")))
    val scored = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"))
      .join(q, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("qe"), col("ce")).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos") * 1e4).cast("long").as("cos_e4"))
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim) in
    * [-1, 1): md5-derived so any engine can reproduce it; computed ONCE on
    * the driver (the matrices are plan literals — round 1 recomputed a
    * hash per row × plane × dim). */
  def planeComponent(plane: Int, dim: Int): Double =
    graft.text.TextOps.h64jvm(s"rhp:$plane:$dim").toDouble /
      1152921504606846976.0 * 2.0 - 1.0 // 2^60

  /** Hyperplane matrix for one LSH table: nPlanes rows × dim columns. */
  def planeMatrix(nPlanes: Int, planeOffset: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(nPlanes, dim)((p, d) => planeComponent(planeOffset + p, d))

  /** Sign-random-projection LSH bucket id: `nPlanes` sign bits of dots
    * with the precomputed hyperplane rows. `planeOffset` selects an
    * independent plane set (one per LSH table — tables MUST use distinct
    * planes or they all produce identical buckets). */
  def lshBucket(embedding: Column, nPlanes: Int, planeOffset: Int, dim: Int): Column = {
    val planes = planeMatrix(nPlanes, planeOffset, dim)
    // fail loudly on a length mismatch: zip_with would silently pad with
    // nulls, every sign bit would read 0, and ALL vectors would land in
    // one bucket per table — LSH degenerating to an n² all-pairs join
    // (still correct after rescoring, quadratically slower)
    val checked = when(size(embedding) === dim, embedding)
      .otherwise(raise_error(concat(
        lit(s"lshBucket: embedding length != $dim (got "),
        size(embedding).cast("string"), lit(")"))))
    planes.zipWithIndex.map { case (row, p) =>
      val dotP = aggregate(
        zip_with(checked, typedlit(row.toSeq), (x, c) => x.cast("double") * c),
        lit(0.0), (acc, v) => acc + v)
      when(dotP >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Approximate near-duplicate pairs: cosine >= threshold among pairs
    * sharing at least one of `nTables` LSH buckets. Scale path: join is
    * bucket-local; table count trades recall for cost. */
  def lshNearDupPairs(
      corpus: DataFrame, threshold: Double = 0.9,
      nPlanes: Int = 10, nTables: Int = 6, dim: Int = 64): DataFrame = {
    val tabled = corpus.select(col("vec_id"), col("embedding"),
        posexplode(array((0 until nTables).map(t =>
          lshBucket(col("embedding"), nPlanes, t * nPlanes, dim) + lit(t.toLong << 32)): _*))
          .as(Seq("tbl", "bucket")))
      .select(col("vec_id"), col("embedding"), col("bucket"))
    val cand = tabled.as("x").join(tabled.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"),
        col("x.embedding").as("ea"), col("y.embedding").as("eb"))
      .distinct()
    cand.select(col("vec_a"), col("vec_b"), cosine(col("ea"), col("eb")).as("cos"))
      .filter(col("cos") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("cos") * 1e4).cast("long").as("cos_e4"))
  }

  /** Exact cosine near-dup pairs (brute force a<b) — the oracle-checkable
    * reference for [[lshNearDupPairs]]. */
  def bruteForceNearDupPairs(corpus: DataFrame, threshold: Double = 0.9): DataFrame = {
    val a = corpus.select(col("vec_id").as("vec_a"), col("embedding").as("ea"))
    val b = corpus.select(col("vec_id").as("vec_b"), col("embedding").as("eb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"), cosine(col("ea"), col("eb")).as("cos"))
      .filter(col("cos") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("cos") * 1e4).cast("long").as("cos_e4"))
  }

  /** IVF-style bucketed top-k: probe only the query's LSH bucket(s) —
    * the scale path for [[bruteForceTopK]]. Recall depends on nTables. */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame, k: Int = 5,
      nPlanes: Int = 8, nTables: Int = 4, dim: Int = 64): DataFrame = {
    def tabled(df: DataFrame, idCol: String) =
      df.select(col("vec_id").as(idCol), col("embedding"),
          posexplode(array((0 until nTables).map(t =>
            lshBucket(col("embedding"), nPlanes, t * nPlanes, dim) + lit(t.toLong << 32)): _*))
            .as(Seq("tbl", "bucket")))
        .select(col(idCol), col("embedding"), col("bucket"))
    val c = tabled(corpus, "neighbor_id")
    val q = tabled(queries, "query_id").withColumnRenamed("embedding", "qe")
    val cand = c.join(q, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("qe"), col("embedding"))
      .distinct()
    val scored = cand.select(col("query_id"), col("neighbor_id"),
      cosine(col("qe"), col("embedding")).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos") * 1e4).cast("long").as("cos_e4"))
  }
}
