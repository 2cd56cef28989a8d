package graft

import org.apache.spark.sql.functions._
import graft.derive.Derive
import graft.synth.Synth

class DeriveSpec extends SparkSpec {

  lazy val turns = Synth.transcripts(spark, nConvs = 200, seed = 42).cache()
  lazy val withVid = Derive.withDenseVid(turns).cache()

  test("synthetic transcripts have the exact input_hint schema") {
    assert(turns.schema.map(f => (f.name, f.dataType.simpleString)) ===
      Seq("conv_id" -> "string", "turn_idx" -> "int", "role" -> "string",
        "text" -> "string", "tool" -> "string", "ts" -> "timestamp"))
    assert(turns.count() > 400)
    // (conv_id, turn_idx) unique
    assert(turns.groupBy("conv_id", "turn_idx").count().filter(col("count") > 1).isEmpty)
  }

  test("per-turn text equality under stable (conv_id, turn_idx) ordering") {
    // north-rule invariant: the derivation must not disturb per-turn text;
    // regenerate and compare positionally under the stable ordering
    val a = turns.orderBy("conv_id", "turn_idx").select("text").collect().map(_.getString(0))
    val b = Synth.transcripts(spark, nConvs = 200, seed = 42)
      .orderBy("conv_id", "turn_idx").select("text").collect().map(_.getString(0))
    assert(a.sameElements(b))
    // and vid assignment preserves the turn rows bit-for-bit
    val c = withVid.orderBy("conv_id", "turn_idx").select("text").collect().map(_.getString(0))
    assert(a.sameElements(c))
  }

  test("dense vids are exactly [0, N) in (conv_id, turn_idx) order") {
    val n = withVid.count()
    val vids = withVid.orderBy("conv_id", "turn_idx").select("vid").collect().map(_.getLong(0))
    assert(vids.sameElements(0L until n))
  }

  test("dense vid assignment is parallelism-invariant") {
    val p1 = Derive.withDenseVid(turns.repartition(1))
      .orderBy("conv_id", "turn_idx").select("vid").collect().map(_.getLong(0))
    val p7 = Derive.withDenseVid(turns.repartition(7))
      .orderBy("conv_id", "turn_idx").select("vid").collect().map(_.getLong(0))
    assert(p1.sameElements(p7))
  }

  test("edge derivation: succession/reply/skip/tool-chain counts and weights") {
    val edges = Derive.edges(withVid).cache()
    // no self loops, no duplicate (src,dst)
    assert(edges.filter(col("src") === col("dst")).isEmpty)
    assert(edges.groupBy("src", "dst").count().filter(col("count") > 1).isEmpty)

    // brute-force oracle on the driver
    val t = withVid.select("conv_id", "turn_idx", "role", "tool", "vid")
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), Option(r.getString(3)), r.getLong(4)))
      .sortBy(x => (x._1, x._2))
    val byConv = t.groupBy(_._1).values
    val exp = scala.collection.mutable.Map[(Long, Long), Long]().withDefaultValue(0L)
    for (conv <- byConv) {
      val s = conv.sortBy(_._2)
      for (Array(a, b) <- s.sliding(2).map(_.toArray) if s.length >= 2) {
        exp((a._5, b._5)) += 1L                       // succession
        if (a._3 != b._3) exp((a._5, b._5)) += 2L     // reply
      }
      for (Array(a, _, c) <- s.sliding(3).map(_.toArray) if s.length >= 3)
        exp((a._5, c._5)) += 1L                       // skip
    }
    val toolUses = t.filter(_._4.isDefined).groupBy(_._4.get)
    for ((_, uses) <- toolUses) {
      val s = uses.sortBy(x => (x._1, x._2)).take(Derive.MaxToolChain.toInt)
      for (Array(a, b) <- s.sliding(2).map(_.toArray) if s.length >= 2)
        exp((a._5, b._5)) += 1L                       // tool chain
    }
    val expected = exp.toSeq.filter { case ((s, d), _) => s != d }.sortBy(_._1)
    val got = edges.orderBy("src", "dst").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2).toLong)).toSeq
    assert(got === expected)
  }

  test("events adapter derivation is deterministic across parallelism") {
    val dir = "/root/testdata/sf0.001"
    val e1 = SparkEntry.eventEdges(spark, dir).orderBy("src", "dst").collect().toSeq
    val e2 = Derive.edges(Synth.eventsAsTranscripts(
        spark.read.parquet(s"$dir/events.parquet").repartition(13)))
      .orderBy("src", "dst").collect().toSeq
    assert(e1 === e2)
  }
}
