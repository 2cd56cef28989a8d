package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Edge-table sources and sinks — the Spark expression of the reference's
  * storage layer (SURVEY.md §2.1):
  *  - S2 text edgelist scan  (include/storage.hpp:68-157): whitespace-
  *    separated `src dst [weight]` lines → csv reader with explicit schema
  *    (Spark's newline-aligned file splitting replaces the reference's
  *    manual `partition_text_file`);
  *  - S3 sinks (storage.hpp:57-66,159-186): parquet (replacing the packed
  *    binary format — we own the format) and text edgelist;
  *  - S4 gconverter (src/tools/gconverter.cpp:93-115): one-call
  *    text → parquet conversion;
  *  - S7 metapath scheme file (src/apps/metascheme.hpp:69-116): tiny
  *    driver-side config parse, broadcast by value.
  */
object EdgeIO {

  val edgeSchema: StructType = new StructType()
    .add("src", LongType).add("dst", LongType).add("weight", DoubleType)

  /** Read a whitespace-separated edgelist: `src dst` (weight defaults 1.0)
    * or `src dst weight`. */
  def readEdgeList(spark: SparkSession, path: String, weighted: Boolean = true): DataFrame = {
    val raw = spark.read
      .option("delimiter", " ")
      .schema(if (weighted) edgeSchema
        else new StructType().add("src", LongType).add("dst", LongType))
      .csv(path)
    if (weighted) raw.withColumn("weight", coalesce(col("weight"), lit(1.0)))
    else raw.withColumn("weight", lit(1.0))
  }

  /** Write the edge table as a text edgelist (reference write_edgelist). */
  def writeEdgeList(edges: DataFrame, path: String, withWeights: Boolean = true): Unit = {
    val line =
      if (withWeights)
        concat_ws(" ", col("src"), col("dst"),
          // weights are integer-valued counts; print compactly like the
          // reference's %f-free unweighted form when integral
          when(col("weight") === col("weight").cast("long"), col("weight").cast("long").cast("string"))
            .otherwise(col("weight").cast("string")))
      else concat_ws(" ", col("src"), col("dst"))
    edges.select(line.as("value")).write.mode(SaveMode.Overwrite).text(path)
  }

  def writeParquet(edges: DataFrame, path: String): Unit =
    edges.write.mode(SaveMode.Overwrite).parquet(path)

  /** gconverter: text edgelist → parquet. */
  def convert(spark: SparkSession, inPath: String, outPath: String, weighted: Boolean): Unit =
    writeParquet(readEdgeList(spark, inPath, weighted), outPath)

  /** Metapath scheme file (reference format): first line
    * `scheme_num state_num`, then per scheme a `length` line followed by
    * `length` lines of `state_num` 0/1 flags.
    * @return schemes(s)(step)(etype) = allowed */
  def readMetapathSchemes(path: String): Seq[Seq[Seq[Boolean]]] = {
    val lines = scala.io.Source.fromFile(path).getLines()
      .map(_.trim).filter(_.nonEmpty).toSeq
    val Array(schemeNum, stateNum) = lines.head.split("\\s+").map(_.toInt)
    var idx = 1
    (0 until schemeNum).map { _ =>
      val len = lines(idx).toInt
      idx += 1
      val rows = (0 until len).map { r =>
        lines(idx + r).split("\\s+").take(stateNum).map(_ == "1").toSeq
      }
      idx += len
      rows
    }
  }

  def writeMetapathSchemes(path: String, schemes: Seq[Seq[Seq[Boolean]]]): Unit = {
    val stateNum = schemes.head.head.size
    val sb = new StringBuilder(s"${schemes.size} $stateNum\n")
    schemes.foreach { s =>
      sb.append(s"${s.size}\n")
      s.foreach { row => sb.append(row.map(b => if (b) "1" else "0").mkString(" ")).append("\n") }
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), sb.toString)
  }
}
