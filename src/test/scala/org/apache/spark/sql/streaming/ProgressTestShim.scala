package org.apache.spark.sql.streaming

import java.util.UUID

import scala.jdk.CollectionConverters._

/** Test-only factory for synthetic progress events: Kafka is absent from
  * the CI image, so the listener's JSON-offset lag path is exercised by
  * feeding it progress objects of exactly the shape a Kafka source
  * reports (`protected[spark]` constructors — hence this package).
  */
object ProgressTestShim {

  def source(description: String, startOffset: String, endOffset: String,
             latestOffset: String, numInputRows: Long): SourceProgress =
    new SourceProgress(description, startOffset, endOffset, latestOffset,
      numInputRows, 0.0, 0.0, Map.empty[String, String].asJava)

  def progress(src: SourceProgress, outputRows: Long): StreamingQueryProgress =
    new StreamingQueryProgress(
      UUID.randomUUID(), UUID.randomUUID(), null, "2026-01-01T00:00:00.000Z",
      0L, 0L,
      Map.empty[String, java.lang.Long].asJava,
      Map.empty[String, String].asJava,
      Array.empty[StateOperatorProgress],
      Array(src),
      new SinkProgress("TestSink", outputRows, Map.empty[String, String].asJava),
      Map.empty[String, org.apache.spark.sql.Row].asJava)

  def event(p: StreamingQueryProgress): StreamingQueryListener.QueryProgressEvent =
    new StreamingQueryListener.QueryProgressEvent(p)
}
