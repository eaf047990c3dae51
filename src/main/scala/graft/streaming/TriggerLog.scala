package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.streaming.StreamingQueryListener

/** Opt-in per-trigger cost recorder for the streaming legs — the
  * instrumentation behind SCALING.md's per-trigger p95 table. Disabled
  * (and zero-cost) in normal runs; [[graft.TriggerStats]] enables it,
  * labels each query via [[setContext]], and drains the recorded
  * `triggerExecution` durations after the stream terminates.
  *
  * Per-trigger cost is the number the full-suite stress totals hide: a
  * streaming leg whose TOTAL grows linearly with corpus size could
  * still conceal a per-trigger cost growing with BATCH size (state
  * rescan, unpruned corpus join inside the fold) — the p95 of
  * individual trigger durations across fixture scales is the direct
  * check that per-trigger work stays batch-sized.
  */
object TriggerLog {

  @volatile private[graft] var enabled = false
  @volatile private var ctx = ""
  private val buf = new ConcurrentLinkedQueue[(String, Long, Long)]()

  /** Label subsequently recorded triggers (the runner sets this to the
    * query name before invoking it — queries run one at a time).
    */
  private[graft] def setContext(c: String): Unit = ctx = c

  /** Snapshot-and-clear: (context, batchId, triggerExecution ms). */
  private[graft] def drain(): Seq[(String, Long, Long)] = {
    val b = Seq.newBuilder[(String, Long, Long)]
    var e = buf.poll()
    while (e != null) { b += e; e = buf.poll() }
    b.result()
  }

  /** Attached to every [[StreamEnv.streamSession]] when enabled. */
  private[graft] val listener: StreamingQueryListener = new StreamingQueryListener {
    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      if (enabled) {
        val ms = Option(e.progress.durationMs.get("triggerExecution"))
          .map(_.longValue()).getOrElse(0L)
        buf.add((ctx, e.progress.batchId, ms)): Unit
      }
    }
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
  }
}
