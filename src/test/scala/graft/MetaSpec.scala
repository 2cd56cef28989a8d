package graft

import org.apache.spark.sql.functions._
import graft.sources.EdgeIO
import graft.walk.Walk

/** Metapath walk semantics + storage round-trips (reference test_storage /
  * test_metapath analogues). */
class MetaSpec extends SparkSpec {
  import spark.implicits._

  test("edgelist round-trip: write -> read preserves the edge multiset") {
    val edges = randomEdges(vNum = 50, eNum = 300, seed = 41)
    val dir = java.nio.file.Files.createTempDirectory("graft-io").toString
    EdgeIO.writeEdgeList(edges, s"$dir/el")
    val back = EdgeIO.readEdgeList(spark, s"$dir/el")
    assert(collectEdges(back).sorted === collectEdges(edges).sorted)
    // converter: text -> parquet
    EdgeIO.convert(spark, s"$dir/el", s"$dir/pq", weighted = true)
    assert(collectEdges(spark.read.parquet(s"$dir/pq")).sorted === collectEdges(edges).sorted)
  }

  test("metapath scheme file round-trip (reference format)") {
    val schemes = Seq(
      Seq(Seq(true, false, false), Seq(false, true, false)),
      Seq(Seq(false, false, true), Seq(true, true, false), Seq(false, true, true)))
    val p = java.nio.file.Files.createTempDirectory("graft-sch").toString + "/schemes.txt"
    EdgeIO.writeMetapathSchemes(p, schemes)
    assert(EdgeIO.readMetapathSchemes(p) === schemes)
  }

  test("metapath walk: only scheme-allowed edge types are ever taken") {
    val rnd = new scala.util.Random(43)
    // dense typed digraph: 20 vertices, type = (src+dst) % 3
    val edges = (for {
      s <- 0L until 20L; d <- 0L until 20L if s != d && rnd.nextDouble() < 0.5
    } yield (s, d, 1.0 + rnd.nextInt(4), ((s + d) % 3).toInt))
      .toDF("src", "dst", "weight", "etype").cache()
    val schemes = Seq(
      Seq(Seq(true, false, false), Seq(false, true, false)),  // types 0,1,0,1,...
      Seq(Seq(false, false, true)))                            // type 2 only
    val starts = edges.select(col("src").as("curV")).distinct()
      .orderBy("curV").limit(20)
      .withColumn("walkerId", col("curV") * 2) // even ids -> scheme 0, ...
    val starts2 = starts.select(col("walkerId"), col("curV"))
      .unionAll(starts.select((col("walkerId") + 1).as("walkerId"), col("curV")))
    val fp = Walk.metapath(edges.toDF(), starts2, schemes, maxSteps = 6, seed = 7)
    val paths = Walk.paths(fp).collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
    assert(paths.nonEmpty)
    val typeOf = edges.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(3)).toMap
    paths.foreach { case (w, p) =>
      val scheme = schemes((w % 2).toInt)
      p.sliding(2).zipWithIndex.foreach { case (pair, s) =>
        if (pair.size == 2) {
          val et = typeOf((pair(0), pair(1)))
          assert(scheme(s % scheme.size)(et),
            s"walker $w step $s took illegal type $et edge ${pair(0)}->${pair(1)}")
        }
      }
    }
    // scheme-1 walkers (odd) must only ever traverse type-2 edges, and
    // scheme-0 walkers alternate 0,1,0,1 — spot-check coverage: some
    // walker actually advanced more than one step
    assert(paths.exists(_._2.size > 2))
  }

  test("metapath: walker dies at a vertex with no allowed out-edge type") {
    // chain 0-(t0)->1-(t1)->2, scheme allows only type 0 at every step
    val edges = Seq((0L, 1L, 1.0, 0), (1L, 2L, 1.0, 1))
      .toDF("src", "dst", "weight", "etype")
    val schemes = Seq(Seq(Seq(true, false)))
    val starts = Seq((0L, 0L)).toDF("walkerId", "curV")
    val fp = Walk.metapath(edges, starts, schemes, maxSteps = 5, seed = 3)
    val p = Walk.paths(fp).collect().head.getSeq[Long](1)
    assert(p === Seq(0L, 1L)) // reached 1, then no allowed type -> died
  }
}
