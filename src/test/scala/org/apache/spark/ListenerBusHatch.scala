package org.apache.spark

/** Test-only hatch into the private[spark] listener bus: the PlanSpec
  * sub-job window lint attributes asynchronously-delivered
  * QueryExecutionListener events to the query under construction, which
  * needs a deterministic drain point between queries. */
object ListenerBusHatch {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
