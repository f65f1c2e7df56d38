package graft.queries

import org.apache.spark.sql.SparkSession

/** Per-(session, key) handle cache — the build-once / validate-once-per-
  * session lifecycle every artifact-backed query shares (ScaleQueries'
  * serving-handle pattern, generalized): the first use in a session pays
  * the stamp check (a corpus fingerprint aggregation) or the build;
  * every later use reuses the handle, because a real pipeline opens its
  * artifact once per session, not once per query. Access-order LRU bound
  * + application-end eviction, so a long-lived JVM cycling short
  * sessions can't accumulate handles. */
private[graft] object SessionHandles {
  private val MaxHandles = 32
  private val armed = new java.util.concurrent.atomic.AtomicBoolean(false)
  private val handles = new java.util.LinkedHashMap[
      (SparkSession, String), AnyRef](16, 0.75f, true) {
    override def removeEldestEntry(
        e: java.util.Map.Entry[(SparkSession, String), AnyRef]): Boolean =
      size() > MaxHandles
  }

  private def arm(s: SparkSession): Unit =
    if (armed.compareAndSet(false, true))
      s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
          handles.synchronized(handles.clear())
          armed.set(false)
        }
      })

  def cached[T <: AnyRef](s: SparkSession, key: String)(make: => T): T = {
    arm(s)
    handles.synchronized {
      Option(handles.get((s, key))) match {
        case Some(v) => v.asInstanceOf[T]
        case None =>
          val v = make
          handles.put((s, key), v)
          v
      }
    }
  }

  /** Test hook: current handle count (IvfServingSpec-style bound checks). */
  private[graft] def size: Int = handles.synchronized(handles.size())
}
