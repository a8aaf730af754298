package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.types.{StringType, StructType}
import graft.core.{LinkedMsg, Msg}

/** Sources/sinks + the end-to-end streaming job wiring, mirroring the
  * reference topology (SURVEY.md §3.1): Kafka(test-topic) → parse → watermark
  * → link → aggregate → Kafka(linked-topic) + console.
  *
  * The Kafka connector jar (`spark-sql-kafka-0-10`) is a deploy-time
  * dependency — not present in this offline container, so [[kafkaSource]] /
  * [[kafkaSink]] compile but are exercised only via their option-set tests;
  * everything downstream of the source is fully tested through
  * MemoryStream (StreamingSpec, PipelineSpec).
  */
object Pipeline {

  /** All-string wire schema: numerics arrive as arbitrary JSON scalars and
    * are coerced leniently, like the reference's `int(float(x))`.
    */
  private val wireSchema: StructType = StructType.fromDDL(
    "id STRING, src_ip STRING, dst_ip STRING, " +
      "start_at_ms STRING, latency_msec STRING, end_at_ms STRING")

  /** P1 — lenient parse (reference `parse_message`,
    * `simpy_kafka_reader.py:42-77`): missing fields default to ""/0/0.0;
    * numeric strings coerce via trunc-toward-zero (`int(float(x))` ≡ Spark's
    * double→long cast). Divergence: the reference does NOT catch JSON parse
    * errors (a malformed record crashes the job); we default the whole row —
    * strictly more robust, same values on every parseable record.
    */
  def parseMsgs(raw: Dataset[String]): Dataset[Msg] = {
    val spark = raw.sparkSession
    import spark.implicits._
    raw.select(from_json(col("value"), wireSchema).as("m"))
      .select(
        coalesce(col("m.id"), lit("")).as("id"),
        coalesce(col("m.src_ip"), lit("")).as("src_ip"),
        coalesce(col("m.dst_ip"), lit("")).as("dst_ip"),
        coalesce(expr("try_cast(try_cast(m.start_at_ms AS DOUBLE) AS BIGINT)"),
          lit(0L)).as("start_at_ms"),
        coalesce(expr("try_cast(m.latency_msec AS DOUBLE)"), lit(0.0))
          .as("latency_msec"),
        coalesce(expr("try_cast(try_cast(m.end_at_ms AS DOUBLE) AS BIGINT)"),
          lit(0L)).as("end_at_ms"))
      .as[Msg]
  }

  /** File sources through the same lenient wire parse as the Kafka path:
    * a JSON-lines directory read as raw text → [[parseMsgs]]. Works batch
    * (`spark.read`) and streaming (`spark.readStream` — set
    * `streaming = true` for a file-watching source with the same
    * semantics). Malformed lines default the row, exactly like the wire.
    */
  def jsonFileMsgs(spark: org.apache.spark.sql.SparkSession, path: String,
      streaming: Boolean = false): Dataset[Msg] = {
    import spark.implicits._
    val raw =
      if (streaming) spark.readStream.text(path).select(col("value")).as[String]
      else spark.read.text(path).select(col("value")).as[String]
    parseMsgs(raw)
  }

  /** S1 — Kafka source with the reference's consumer config
    * (`simpy_kafka_reader.py:345-356`): subscribe `test-topic`,
    * `auto.offset.reset` default latest.
    */
  def kafkaSource(spark: SparkSession, bootstrapServers: String,
      topic: String = "test-topic",
      startingOffsets: String = "latest"): Dataset[String] = {
    import spark.implicits._
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .load()
      .select(col("value").cast(StringType))
      .as[String]
  }

  /** Serialize enriched messages to the reference's output JSON shape
    * (`row_to_message` + linked arrays, `README.md:49-60`).
    */
  def toLinkedJson(linked: Dataset[LinkedMsg]): DataFrame =
    linked.select(to_json(struct(
      col("id"), col("src_ip"), col("dst_ip"), col("start_at_ms"),
      col("latency_msec"), col("end_at_ms"), col("parents"), col("children")))
      .as("value"))

  /** S2 — Kafka sink, at-least-once via checkpointing
    * (`simpy_kafka_reader.py:396-402`).
    */
  def kafkaSink(linked: Dataset[LinkedMsg], bootstrapServers: String,
      topic: String = "linked-topic",
      checkpointLocation: String): DataStreamWriter[org.apache.spark.sql.Row] =
    toLinkedJson(linked).writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
      .option("checkpointLocation", checkpointLocation)
      .outputMode("append")

  /** S3 — console sink (reference `stream.print()`). */
  def consoleSink(linked: Dataset[LinkedMsg]): DataStreamWriter[LinkedMsg] =
    linked.writeStream.format("console").outputMode("append")

  /** The full reference job (S1→P1→W1/W2→J1→A1→S2), one call
    * (`simpy_kafka_reader.main`, `:320-405`). Checkpoint interval ≈ the
    * reference's 10 s via the processing-time trigger.
    */
  def runKafkaJob(spark: SparkSession, bootstrapServers: String,
      checkpointLocation: String,
      inTopic: String = "test-topic",
      outTopic: String = "linked-topic",
      maxOutOfOrder: String = "30 seconds"): StreamingQuery = {
    val msgs = parseMsgs(kafkaSource(spark, bootstrapServers, inTopic))
    val linked = StreamingChainLink.linked(msgs, maxOutOfOrder)
    kafkaSink(linked, bootstrapServers, outTopic, checkpointLocation)
      .trigger(Trigger.ProcessingTime("10 seconds"))
      .start()
  }

  /** File-based twin of [[runKafkaJob]]: JSON-lines files under `inDir`
    * stream through the IDENTICAL topology — lenient wire parse → watermark
    * → chained linking/aggregation → reference-shape output JSON — to
    * JSON-lines under `outDir`. Every stage `runKafkaJob` executes runs
    * here except the Kafka connector itself (a deploy-time jar, absent in
    * this offline environment), so the wire path is e2e-tested and the
    * connector remains the only unexercised seam. Also the practical entry
    * point for users replaying captured topic dumps without a broker.
    */
  def runFileJob(spark: SparkSession, inDir: String, outDir: String,
      checkpointLocation: String,
      maxOutOfOrder: String = "30 seconds"): StreamingQuery = {
    val msgs = jsonFileMsgs(spark, inDir, streaming = true)
    val linked = StreamingChainLink.linked(msgs, maxOutOfOrder)
    toLinkedJson(linked).writeStream
      .format("text")
      .option("path", outDir)
      .option("checkpointLocation", checkpointLocation)
      .outputMode("append")
      .start()
  }
}
