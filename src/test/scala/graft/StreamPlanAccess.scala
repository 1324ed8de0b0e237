package org.apache.spark.sql.execution.streaming.runtime

import org.apache.spark.sql.streaming.StreamingQuery

/** Test-scope bridge into the `private[sql]` streaming internals: the
  * EXECUTED plan of the most recent micro-batch. The r15 lesson
  * (predicate pushdown silently cloning heavy expressions, invisible
  * to exchange-counting pins) applies verbatim to micro-batch plans —
  * the same optimizer runs per trigger — but `df.queryExecution` on a
  * streaming frame throws, so the duplication gate needs the
  * IncrementalExecution behind the query handle. */
object StreamPlanAccess {
  def lastExecutedPlan(q: StreamingQuery): String =
    q.asInstanceOf[StreamingQueryWrapper]
      .streamingQuery.lastExecution.executedPlan.toString
}
