package graft.functions

import org.apache.spark.sql.SparkSession

/** One-live-frame release registry, scoped PER SparkSession.
  *
  * The unmanaged convenience wrappers around Managed operators
  * (lshTopK, topic balance) keep at most one cached frame alive by
  * releasing the previous call's persist when the next call arrives. A
  * single process-wide `AtomicReference` for that was structural
  * hazard, not just a usage note: a call from ANOTHER SparkSession
  * (CoresProbe's lo/hi sessions, concurrent test suites) would
  * unpersist a frame the first session's still-lazy query was about to
  * evaluate — correct but silently recomputing the expensive subtree
  * on both cap branches — and the last closure pinned its frame AND
  * its SparkSession until the next call or JVM exit.
  *
  * This registry keys the predecessor by session identity in a
  * `WeakHashMap`: calls from different sessions never release each
  * other's frames, and a stopped-and-dereferenced session's entry is
  * collected with the session instead of pinning it (nothing cached
  * survives a stopped session anyway). Releases of predecessors from
  * already-stopped sessions are NonFatal-swallowed — their unpersist
  * throws on the dead driver endpoint.
  *
  * Instantiate ONE registry per call site (per operator family): two
  * operators sharing a registry would release each other's frames
  * within a session.
  */
final class SessionRelease {

  private val last = new java.util.WeakHashMap[SparkSession, () => Unit]()

  /** Register `release` as this session's live release handle and run
    * the session's previous one (if any). Within one session this
    * bounds the unmanaged path to one live cached frame; releasing the
    * predecessor is correctness-safe — an unmaterialized predecessor
    * recomputes. */
  def swap(spark: SparkSession, release: () => Unit): Unit = {
    val prev = last.synchronized { last.put(spark, release) }
    if (prev != null) try prev() catch {
      case scala.util.control.NonFatal(_) => ()
    }
  }
}
