package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** No-silent-caps channel: operators that bound work (per-tool chain caps,
  * LSH bucket limits) attach `observe()` metrics named `graft_*` to their
  * plans; this listener prints any non-zero dropped counts every time the
  * query actually executes. Zero extra Spark jobs — CollectMetrics rides
  * the existing action.
  */
object Metrics {

  private val installed =
    java.util.Collections.synchronizedSet(new java.util.HashSet[String]())

  /** Idempotently install the observed-metrics printer on this session. */
  def ensure(spark: SparkSession): Unit = {
    if (installed.add(String.valueOf(System.identityHashCode(spark)))) {
      spark.listenerManager.register(new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
          qe.observedMetrics.foreach { case (name, row) =>
            if (name.startsWith("graft_")) {
              val fields = row.schema.fieldNames.zip(row.toSeq)
                .map { case (k, v) => s"$k=$v" }.mkString(" ")
              val nonZero = row.toSeq.exists {
                case l: Long => l != 0L
                case i: Int => i != 0
                case d: Double => d != 0.0
                case null => false
                case _ => true
              }
              if (nonZero) System.err.println(s"[graft:caps] $name $fields")
            }
          }
        }
        override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit = ()
      })
    }
  }
}
