package graft.queries

import org.apache.spark.sql.SparkSession

/** Per-(session, key) handle cache — the build-once / validate-once-per-
  * session lifecycle every artifact-backed query shares: the first use in
  * a session pays the stamp check (a corpus fingerprint aggregation) or
  * the build; every later use reuses the handle, because a real pipeline
  * opens its artifact once per session, not once per query. Access-order
  * LRU bound + application-end eviction, so a long-lived JVM cycling
  * short sessions can't accumulate handles. */
private[graft] object SessionHandles {
  private val MaxHandles = 32
  private val armed = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** One memo cell per (session, key): the cell is registered under the
    * map lock but its value is computed OUTSIDE it (`lazy val`
    * synchronizes per cell), so two sessions opening DIFFERENT artifacts
    * build concurrently while the same key still builds exactly once. */
  private final class Cell(mk: () => AnyRef) { lazy val value: AnyRef = mk() }

  private val handles = new java.util.LinkedHashMap[
      (SparkSession, String), Cell](16, 0.75f, true) {
    override def removeEldestEntry(
        e: java.util.Map.Entry[(SparkSession, String), Cell]): Boolean =
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
    val cell = handles.synchronized {
      Option(handles.get((s, key))).getOrElse {
        val c = new Cell(() => make)
        handles.put((s, key), c)
        c
      }
    }
    cell.value.asInstanceOf[T]
  }

  /** Test hook: current handle count (IvfServingSpec bound checks). */
  private[graft] def size: Int = handles.synchronized(handles.size())

  /** The shared tmp-artifact path convention every build-once query
    * family uses (`graft_<family>_<sf-dir-hash>` under java.io.tmpdir) —
    * one definition so a future change (collision-safer key, overridable
    * root) lands everywhere at once. */
  private[queries] def tmpArtifactPath(family: String, dir: String): String =
    java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft_${family}_${dir.hashCode.toHexString}").toString
}
