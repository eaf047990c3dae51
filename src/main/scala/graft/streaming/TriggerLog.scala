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
  private val buf =
    new ConcurrentLinkedQueue[(String, Long, Map[String, Long])]()

  /** Label subsequently recorded triggers (the runner sets this to the
    * query name before invoking it — queries run one at a time).
    */
  private[graft] def setContext(c: String): Unit = ctx = c

  /** Snapshot-and-clear: (context, batchId, durationMs phase map —
    * `triggerExecution` plus Spark's per-phase splits: `addBatch`
    * (the micro-batch job itself), `getBatch`/`latestOffset` (source
    * listing), `walCommit`/`commitOffsets` (checkpoint log fsyncs),
    * `queryPlanning`). The phase splits are what attributes an
    * inflated trigger: engine work lands in addBatch, source/dir
    * listing in latestOffset, checkpoint I/O in the commit phases.
    */
  private[graft] def drain(): Seq[(String, Long, Map[String, Long])] = {
    val b = Seq.newBuilder[(String, Long, Map[String, Long])]
    var e = buf.poll()
    while (e != null) { b += e; e = buf.poll() }
    b.result()
  }

  /** Attached to every [[StreamEnv.streamSession]] when enabled. */
  private[graft] val listener: StreamingQueryListener = new StreamingQueryListener {
    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      if (enabled) {
        val phases = {
          import scala.jdk.CollectionConverters._
          e.progress.durationMs.asScala.map { case (k, v) => k -> v.longValue() }.toMap
        }
        buf.add((ctx, e.progress.batchId, phases)): Unit
      }
    }
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
  }
}
