package org.apache.spark.sql.graftglue

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionColumnNode}

/** Glue in the `org.apache.spark.sql` namespace so graft code can cross the
  * Column ⇄ catalyst-Expression boundary (`private[sql]` in Spark 4's
  * column-node API). This is the standard extension-library pattern; no
  * Spark internals are modified.
  */
object Bridge {
  def expression(c: Column): Expression = ColumnNodeToExpressionConverter(c.node)
  def column(e: Expression): Column = Column(ExpressionColumnNode(e))

  /** Unload every loaded state-store provider now (normally the 60 s
    * maintenance tick does this lazily after a streaming query stops).
    * Run-to-completion verification/bench sessions start many short
    * stateful queries back-to-back; without this each stopped query's
    * in-memory version maps linger and accumulate. */
  def unloadStateStores(): Unit =
    org.apache.spark.sql.execution.streaming.state.StateStore.unloadAll()

  /** Stop the state-store subsystem outright: unloads every provider AND
    * terminates the background maintenance task. Call before
    * `spark.stop()` in batch mains — otherwise the 60 s maintenance tick
    * can fire mid-teardown and stack-trace "SparkEnv not active" onto
    * stderr after the process's final output line. */
  def stopStateStores(): Unit =
    org.apache.spark.sql.execution.streaming.state.StateStore.stop()
}
