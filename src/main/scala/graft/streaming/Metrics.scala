package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Streaming observability (ST5: the reference logs per-city
  * Inserted/Failed lines, etl.py:132-134; SURVEY.md maps this to a
  * StreamingQueryListener). Collects per-batch progress — rows read,
  * processing rate, watermark — queryable from the driver and cheap
  * enough to leave attached in production.
  */
final class MetricsListener extends StreamingQueryListener {

  final case class BatchMetrics(queryName: String, batchId: Long,
                                numInputRows: Long, processedRowsPerSecond: Double,
                                watermark: String)

  private val batches = new java.util.concurrent.ConcurrentLinkedQueue[BatchMetrics]()

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()
  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    batches.add(BatchMetrics(
      Option(p.name).getOrElse(p.id.toString), p.batchId,
      p.numInputRows, p.processedRowsPerSecond,
      Option(p.eventTime.get("watermark")).getOrElse("")))
  }

  def snapshot: Seq[BatchMetrics] = {
    val it = batches.iterator()
    val b = Seq.newBuilder[BatchMetrics]
    while (it.hasNext) b += it.next()
    b.result()
  }

  def totalInputRows: Long = snapshot.map(_.numInputRows).sum
}

object Metrics {
  /** Attach a fresh listener to the session and return it. */
  def attach(spark: SparkSession): MetricsListener = {
    val l = new MetricsListener
    spark.streams.addListener(l)
    l
  }

  def detach(spark: SparkSession, l: MetricsListener): Unit =
    spark.streams.removeListener(l)
}
