package org.apache.spark

/** Bridge into the `private[spark]` listener bus so the bench harness can
  * DRAIN pending listener events before reading its shuffle-bytes counter —
  * listener delivery is asynchronous, and without the drain a query's last
  * stages would be attributed to whichever query ran next. Same technique
  * as [[org.apache.spark.sql.GraftSqlBridge]]: the one-method bridge Spark
  * extension libraries use where no public API exists (Spark's own test
  * utilities call exactly this).
  */
object GraftCoreBridge {

  def drainListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
