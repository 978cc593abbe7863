package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Action-time logging for `observe` metrics.
  *
  * Operators that silently bound their output (e.g. the LSH bucket cap in
  * [[graft.queries.Lsh]]) attach a named `graft_*` observation to the plan;
  * this listener surfaces those counts in the logs after every action, so a
  * capped run is never mistaken for a complete one.
  */
object Metrics {
  // Weak keys: sessions must stay collectable after stop() — a static
  // strong set would pin every session in a long-lived multi-session JVM.
  private val sessions = java.util.Collections.synchronizedSet(
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))
  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Idempotently install a listener on `spark` that logs every observed
    * metric whose name starts with `graft_`. Loss counters (metric
    * columns named `*dropped*` / `*undercut*`) escalate to WARN when
    * nonzero — the capped-never-silent contract's loud half: a capped or
    * exactness-diverged run must not hide at info level.
    */
  def logObserved(spark: SparkSession): Unit = if (sessions.add(spark)) {
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        qe.observedMetrics.foreach { case (name, row) =>
          if (name.startsWith("graft_")) {
            val lossy = row.schema.fieldNames.exists { f =>
              (f.contains("dropped") || f.contains("undercut")) &&
                (row.getAs[Any](f) match {
                  case n: java.lang.Number => n.longValue() > 0L
                  case _ => false
                })
            }
            if (lossy) log.warn(s"observed $name: $row (rows LOST or exactness diverged)")
            else log.info(s"observed $name: $row")
          }
        }
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    })
  }
}
