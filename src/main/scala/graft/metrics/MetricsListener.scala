package graft.metrics

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.LongAdder

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Streaming metrics bridge mirroring the reference's observability
  * surface (`topic_processor.go:133-135`, `partition_processor.go:89-103`):
  * incoming/outgoing message counts and a lag gauge per source, fed from
  * `StreamingQueryProgress` instead of hand-maintained counters. Export
  * to Prometheus is a sink concern (`spark.metrics` servlet); this class
  * keeps the counters queryable in-process for tests and the bench.
  */
final class GraftMetricsListener extends StreamingQueryListener {
  val incoming = new LongAdder          // ≈ kasper incoming_message_count
  val outgoing = new LongAdder          // ≈ kasper outgoing_message_count
  private val lag = new ConcurrentHashMap[String, Long]()  // messages_behind_high_water_mark

  override def onQueryStarted(e: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(e: QueryProgressEvent): Unit = {
    val p = e.progress
    incoming.add(p.numInputRows)
    Option(p.sink).foreach { s =>
      if (s.numOutputRows >= 0) outgoing.add(s.numOutputRows)
    }
    p.sources.foreach { s =>
      // offset-based lag when the source reports numeric offsets
      (Option(s.latestOffset), Option(s.endOffset)) match {
        case (Some(l), Some(c)) =>
          (l.toLongOption, c.toLongOption) match {
            case (Some(lv), Some(cv)) => lag.put(s.description, math.max(0L, lv - cv))
            case _ => ()
          }
        case _ => ()
      }
    }
  }

  def lagFor(sourceDescription: String): Option[Long] = Option(lag.get(sourceDescription))
  def totalIncoming: Long = incoming.sum()
  def totalOutgoing: Long = outgoing.sum()
}
