package graft.derive

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.model.EdgeRow

/** Transcript → link-graph edge derivation (SURVEY.md §2.11).
  *
  * Three edge families over the turn vertices:
  *  - succession:  turn k → turn k+1 within a conversation (weight 1)
  *  - reply:       succession pairs where the role changes (extra weight 2)
  *  - shared-tool: consecutive uses of the same tool, chained in stable
  *                 (conv_id, turn_idx) order across conversations (weight 1)
  *
  * The shared-tool family is a *chain*, not a clique: a clique over a hot
  * tool is O(n²) edges and would not survive a 100× scale-up; the chain is
  * linear in tool uses and preserves connectivity. A per-tool cap
  * ([[MaxToolChain]]) additionally bounds any single tool's contribution.
  *
  * Parallel edges collapse via groupBy(src,dst).sum(weight) — weights are
  * integer-valued co-occurrence counts.
  */
object Derive {

  /** Per-tool cap on chained tool-use occurrences (scale guard). */
  val MaxToolChain = 100000L

  /** Derive the weighted edge table from turns that already carry a `vid`
    * vertex-id column (see [[graft.synth.Synth.eventsAsTranscripts]] or
    * [[withDenseVid]]). Output: (src LONG, dst LONG, weight DOUBLE),
    * self-loop-free, one row per (src,dst).
    */
  /** Succession pairs within each conversation, with the roles on both
    * sides: (src, dst, prev_role, cur_role). */
  def succession(turnsWithVid: DataFrame): DataFrame = {
    val wConv = Window.partitionBy(col("conv_id")).orderBy(col("turn_idx"))
    turnsWithVid
      .select(
        lag(col("vid"), 1).over(wConv).as("src"),
        col("vid").as("dst"),
        lag(col("role"), 1).over(wConv).as("prev_role"),
        col("role").as("cur_role"))
      .filter(col("src").isNotNull)
  }

  /** Second-order reply pairs: turn k → turn k+2 within a conversation
    * (a user turn replying to the previous user turn across the assistant
    * turn in between). Together with succession edges these close
    * (k, k+1, k+2) triangles, giving the link graph non-trivial clustering
    * structure. */
  def skipPairs(turnsWithVid: DataFrame): DataFrame = {
    val wConv = Window.partitionBy(col("conv_id")).orderBy(col("turn_idx"))
    turnsWithVid
      .select(lag(col("vid"), 2).over(wConv).as("src"), col("vid").as("dst"))
      .filter(col("src").isNotNull)
  }

  /** Succession-only edge table (weight 1 per pair) — the per-conversation
    * chain subgraph. */
  def successionEdges(turnsWithVid: DataFrame): DataFrame =
    succession(turnsWithVid)
      .select(col("src"), col("dst"), lit(1.0).as("weight"))

  def edges(turnsWithVid: DataFrame): DataFrame = {
    val t = turnsWithVid.select("conv_id", "turn_idx", "role", "tool", "vid")

    // ONE window pass produces succession + reply + skip (the naive
    // one-branch-per-family plan re-scans and re-shuffles the turns table
    // once per family — 2x the scan/shuffle volume at 100 TB)
    val wConv = Window.partitionBy(col("conv_id")).orderBy(col("turn_idx"))
    val lagged = t.select(
      col("vid"),
      lag(col("vid"), 1).over(wConv).as("v1"),
      lag(col("role"), 1).over(wConv).as("r1"),
      col("role"),
      lag(col("vid"), 2).over(wConv).as("v2"))
    val convEdges = lagged
      .select(explode(array(
        when(col("v1").isNotNull,
          struct(col("v1").as("src"), col("vid").as("dst"), lit(1L).as("w"))),
        when(col("v1").isNotNull && col("r1") =!= col("role"),
          struct(col("v1").as("src"), col("vid").as("dst"), lit(2L).as("w"))),
        when(col("v2").isNotNull,
          struct(col("v2").as("src"), col("vid").as("dst"), lit(1L).as("w"))))).as("e"))
      .select(col("e.src"), col("e.dst"), col("e.w"))
      .filter(col("src").isNotNull)

    val wToolRn = Window.partitionBy(col("tool")).orderBy(col("conv_id"), col("turn_idx"))
    graft.engine.Metrics.ensure(turnsWithVid.sparkSession)
    val toolUses = t
      .filter(col("tool").isNotNull)
      .withColumn("rn", row_number().over(wToolRn))
      // no-silent-caps: rows beyond the per-tool cap are counted via an
      // observe() metric (printed by Metrics' listener on every action)
      .observe("graft_toolchain_cap",
        sum(when(col("rn") > MaxToolChain, 1L).otherwise(0L)).as("dropped_tool_uses"))
      .filter(col("rn") <= MaxToolChain)
    val wTool = Window.partitionBy(col("tool")).orderBy(col("rn"))
    val toolEdges = toolUses
      .select(lag(col("vid"), 1).over(wTool).as("src"), col("vid").as("dst"))
      .filter(col("src").isNotNull)
      .select(col("src"), col("dst"), lit(1L).as("w"))

    convEdges.unionAll(toolEdges)
      .filter(col("src") =!= col("dst"))
      .groupBy("src", "dst")
      .agg(sum("w").cast("double").as("weight"))
  }

  def edgeDs(turnsWithVid: DataFrame): Dataset[EdgeRow] = {
    val spark = turnsWithVid.sparkSession
    import spark.implicits._
    edges(turnsWithVid).as[EdgeRow]
  }

  /** Assign dense, deterministic vertex ids `vid` = global rank of
    * (conv_id, turn_idx), without a single-partition window.
    *
    * Scalable pattern: range-repartition + sort on the key (a total order
    * since (conv_id, turn_idx) is unique), count rows per sorted
    * partition, broadcast the cumulative offsets, then add the local row
    * index per partition. The id equals the global rank, which is
    * independent of partition boundaries — identical output at any
    * parallelism (SURVEY.md §7.4.2).
    */
  def withDenseVid(turns: DataFrame): DataFrame = {
    val spark = turns.sparkSession
    val nPart = math.max(spark.sparkContext.defaultParallelism, 1)
    val keyed = turns
      .repartitionByRange(nPart, col("conv_id"), col("turn_idx"))
      .sortWithinPartitions(col("conv_id"), col("turn_idx"))
      .persist()
    val schema = keyed.schema
    implicit val rowEnc = Encoders.row(schema.add("vid", "long"))
    val counts = keyed
      .mapPartitions { it =>
        Iterator.single(Row(org.apache.spark.TaskContext.getPartitionId().toLong, it.size.toLong))
      }(Encoders.row(new org.apache.spark.sql.types.StructType()
        .add("pid", "long").add("cnt", "long")))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    val offsets = counts.map(_._2).scanLeft(0L)(_ + _)
    val offsetByPid = counts.map(_._1).zip(offsets).toMap
    val bc = spark.sparkContext.broadcast(offsetByPid)
    val out = keyed.mapPartitions { it =>
      val base = bc.value(org.apache.spark.TaskContext.getPartitionId().toLong)
      it.zipWithIndex.map { case (r, i) => Row.fromSeq(r.toSeq :+ (base + i)) }
    }(rowEnc).localCheckpoint(true)
    keyed.unpersist(false)
    out
  }
}
