package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON-lines codec for the reference's message envelope — the
  * serialization half of the Kafka seam that CAN be exercised offline.
  *
  * Kasper messages are sarama records whose payloads are JSON documents
  * (`topic_processor_test.go:23-41` marshals Character/Fiction structs;
  * `sender.go:12-20` sends topic/key/value): a topic DUMP is therefore a
  * file of JSON lines carrying (topic, partition, offset, key, value).
  * This codec round-trips that envelope through Spark's native
  * `to_json`/`from_json` (codegen'd, no UDFs), so:
  *
  *  - an existing kasper deployment can export topics to files and
  *    REPLAY them through any graft query (`replay`) without a broker —
  *    partition/offset order is re-established explicitly, since files
  *    do not preserve consumption order;
  *  - graft output can be written as a topic dump a kasper consumer (or
  *    a later replay) understands (`encode`).
  *
  * Corrupt lines surface as NULL envelopes (PERMISSIVE parse), counted
  * by the caller rather than failing a 100 TB replay — the same
  * poison-message posture as the multimodal decode rail.
  */
object MessageCodec {

  /** The dump envelope: the reference's message shape with STRING
    * key/value (JSON payloads; binary payloads belong in base64 before
    * encoding).
    */
  val envelopeSchema: StructType = StructType(Seq(
    StructField("topic", StringType, nullable = false),
    StructField("partition", IntegerType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("key", StringType, nullable = true),
    StructField("value", StringType, nullable = true)))

  /** Encode (topic, partition, offset, key, value) columns into one
    * JSON line per message.
    */
  def encode(df: DataFrame): DataFrame =
    df.select(to_json(struct(col("topic"), col("partition"), col("offset"),
      col("key"), col("value"))).as("line"))

  /** Decode JSON lines back to envelope columns. Corrupt lines yield a
    * NULL `topic` (and friends) — filter or count them downstream.
    */
  def decode(lines: DataFrame, lineCol: String = "line"): DataFrame =
    lines.select(from_json(col(lineCol), envelopeSchema).as("m"))
      .select(col("m.topic"), col("m.partition"), col("m.offset"),
        col("m.key"), col("m.value"))

  /** Replay a topic dump through a batch plan: decode the envelope,
    * drop corrupt lines, parse each message's JSON `value` with the
    * caller's payload schema, and re-establish the reference's
    * consumption order — (partition, offset) ascending per topic, which
    * kasper guarantees per partition (`partition_processor.go` consumes
    * in offset order) and files do not. Returns the payload columns
    * plus the envelope metadata.
    */
  def replay(lines: DataFrame, valueSchema: StructType,
             lineCol: String = "line"): DataFrame =
    decode(lines, lineCol)
      .filter(col("topic").isNotNull && col("offset").isNotNull)
      .withColumn("v", from_json(col("value"), valueSchema))
      .select((valueSchema.fieldNames.map(f => col(s"v.$f")) ++
        Seq(col("topic"), col("partition"), col("offset"))): _*)
      .orderBy(col("topic"), col("partition"), col("offset"))
}
