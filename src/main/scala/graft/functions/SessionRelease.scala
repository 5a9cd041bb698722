package graft.functions

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
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
  * This registry keys the predecessor by session identity: calls from
  * different sessions never release each other's frames. Because a
  * release closure captures a DataFrame — which strongly references
  * its SparkSession — weak-reference collection can never fire (the
  * value would pin the key), so staleness is handled EXPLICITLY:
  * every swap first sweeps entries whose session's SparkContext is
  * stopped (nothing cached survives a stopped session, and its
  * unpersist would only throw on the dead driver endpoint), AND a
  * SparkListener registered on first use per session drops the entry
  * the moment that session's context ends — so a stopped session's
  * closure (which pins a DataFrame lineage and the session itself)
  * never waits for the next swap on this operator family or JVM exit.
  * The only remaining pin is the most recent LIVE session's closure,
  * inherent to unmanaged one-live-frame semantics; long-lived hosts
  * should prefer the Managed forms.
  *
  * Instantiate ONE registry per call site (per operator family): two
  * operators sharing a registry would release each other's frames
  * within a session.
  */
final class SessionRelease {

  private val last =
    new java.util.HashMap[SparkSession, () => Unit]()

  /** Sessions that already carry this registry's end-of-application
    * listener (guarded by `last`'s monitor). */
  private val seen = new java.util.HashSet[SparkSession]()

  /** Register `release` as this session's live release handle and run
    * the session's previous one (if any). Within one session this
    * bounds the unmanaged path to one live cached frame; releasing the
    * predecessor is correctness-safe — an unmaterialized predecessor
    * recomputes. */
  def swap(spark: SparkSession, release: () => Unit): Unit = {
    def stopped(s: SparkSession): Boolean =
      try s.sparkContext.isStopped catch {
        case scala.util.control.NonFatal(_) => true
      }
    val (prev, firstSeen) = last.synchronized {
      // sweep dead sessions so their closures (and the frames +
      // sessions they capture) never outlive the session they served
      val it = last.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (stopped(e.getKey)) { seen.remove(e.getKey); it.remove() }
      }
      // `seen` can still pin a dead session `last` no longer tracks
      // (its listener registration failed below, then its entry was
      // swapped away): sweep it with the same liveness check
      val si = seen.iterator()
      while (si.hasNext) if (stopped(si.next())) si.remove()
      // seen.add INSIDE the lock: two concurrent first swaps from one
      // session must elect exactly one listener registrar
      (last.put(spark, release), seen.add(spark))
    }
    if (firstSeen) {
      // entries only ever re-appear for LIVE sessions (the sweep and
      // the listener both remove dead ones), so one listener per
      // (registry, session) suffices: when the context ends, drop the
      // entry WITHOUT running it — nothing cached survives a stopped
      // session, and unpersist would only throw on the dead endpoint
      try spark.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(
            end: SparkListenerApplicationEnd): Unit =
          last.synchronized { last.remove(spark); seen.remove(spark); () }
      }) catch { case scala.util.control.NonFatal(_) =>
        // registration failed (context stopped mid-swap): un-mark so a
        // later swap can retry the election instead of this session
        // staying strongly pinned in `seen` until JVM exit
        last.synchronized { seen.remove(spark); () }
      }
    }
    if (prev != null) try prev() catch {
      case scala.util.control.NonFatal(_) => ()
    }
  }
}
