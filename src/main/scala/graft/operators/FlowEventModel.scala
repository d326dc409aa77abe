package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.types._

/** The engine's event model — Spark mapping of the reference's Message
  * (pkg/corev1alpha1/message.go:39-45): opaque binary body + string
  * metadata map + ingest timestamp. Delivery status (message.go:10-33)
  * becomes a per-row `status` column appended by operators that can reject
  * rows (router unroutable, throttler throttled, decoder invalid), and is
  * accounted at batch granularity (SURVEY §2.6.2) rather than per-row acks.
  */
object FlowEventModel {
  val Schema: StructType = StructType(Seq(
    StructField("body", BinaryType, nullable = true),
    StructField("meta", MapType(StringType, StringType), nullable = true),
    StructField("ingest_ts", TimestampType, nullable = true)))

  // Status values mirror message.go:10-33.
  val StatusNew = "NEW"
  val StatusDone = "DONE"
  val StatusPartialSend = "PARTIAL_SEND"
  val StatusInvalid = "INVALID"
  val StatusFailed = "FAILED"
  val StatusTimedOut = "TIMED_OUT"
  val StatusUnroutable = "UNROUTABLE"
  val StatusThrottled = "THROTTLED"
}

case class FlowEvent(body: Array[Byte], meta: Map[String, String], ingest_ts: Timestamp)
