package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.AsOf

/** Streaming as-of enrichment: the custom operator planning INSIDE a
  * micro-batch streaming query. The supported shape is stream-left ⟕asof
  * static-right (a rate table, config history, dimension snapshot): the
  * operator is stateless per micro-batch, so appending the latest
  * at-or-before right row to each streamed event is exactly the batch
  * semantics, batch by batch. (Stream–stream as-of would need cross-batch
  * state and is deliberately NOT claimed — the window formulation plus
  * watermarks covers that territory.)
  */
class StreamAsOfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def ts(s: String) = Timestamp.valueOf(s)

  test("stream-left static-right as-of enriches across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Timestamp)]
    val rates = Seq(
      (10L, ts("2024-01-01 09:00:00")),
      (10L, ts("2024-01-01 09:30:00")),
      (20L, ts("2024-01-01 11:00:00"))
    ).toDF("r_user", "r_ts")
    val stream = input.toDF().toDF("event_id", "user_id", "ts")
    val joined = AsOf.backward(stream, rates, "user_id", "r_user", "ts", "r_ts")
    val q = joined.writeStream.format("memory").queryName("stream_asof")
      .outputMode("append").start()
    try {
      input.addData((1L, 10L, ts("2024-01-01 10:00:00")),
        (2L, 10L, ts("2024-01-01 08:00:00")))
      q.processAllAvailable()
      // second batch: same static side re-applies, unaffected by batch 1
      input.addData((3L, 10L, ts("2024-01-01 09:10:00")),
        (4L, 20L, ts("2024-01-01 12:00:00")),
        (5L, 30L, ts("2024-01-01 12:00:00")))
      q.processAllAvailable()
      val out = spark.table("stream_asof").collect()
        .map(r => r.getAs[Long]("event_id") ->
          Option(r.getAs[Timestamp]("r_ts"))).toMap
      assert(out == Map(
        1L -> Some(ts("2024-01-01 09:30:00")),
        2L -> None,
        3L -> Some(ts("2024-01-01 09:00:00")),
        4L -> Some(ts("2024-01-01 11:00:00")),
        5L -> None))
      assert(spark.table("stream_asof").count() == 5)
    } finally q.stop()
  }
}
