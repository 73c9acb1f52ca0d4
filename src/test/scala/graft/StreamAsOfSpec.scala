package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.AsOf

/** Streaming as-of, three shapes:
  *  1. stream-left ⟕asof static-right — the custom operator planning
  *     INSIDE a micro-batch query, stateless per batch (rate tables,
  *     config history, dimension snapshots);
  *  2. STREAM–STREAM backward (r8, StreamAsOf.asOfEnrichStreams):
  *     cross-batch right-side state on transformWithState, lefts released
  *     by the watermark, rights dominance-pruned;
  *  3. STREAM–STREAM forward with mandatory tolerance (r8,
  *     StreamAsOf.asOfNextStreams): earliest right at-or-after within the
  *     bound — the tolerance is what makes the join decidable and the
  *     state bounded (same reason Spark's stream–stream joins demand a
  *     time-range condition).
  * Each stream–stream test pins output ≡ the batch operator on the same
  * fed data, plus the late-data (watermark-drop) contract.
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

  /** Run `body` with the RocksDB state store provider (the
    * transformWithState requirement), restoring the previous provider. */
  private def withRocksDb(body: => Unit): Unit = {
    val conf = spark.conf
    val saved = conf.getOption("spark.sql.streaming.stateStore.providerClass")
    conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally saved match {
      case Some(v) => conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("stream-stream as-of: a right row arriving AFTER its left still wins, " +
    "and the released output equals batch AsOf.backward") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val purchIn = MemoryStream[(Long, Long, Timestamp)]
      val errIn = MemoryStream[(Long, Long, Timestamp, Double)]
      val purchases = purchIn.toDF().toDF("event_id", "user_id", "ts")
      val errors = errIn.toDF().toDF("error_id", "user_id", "ts", "value")
      val joined = graft.streaming.StreamAsOf.asOfEnrichStreams(
        purchases, errors, watermark = "10 minutes")
      val q = joined.toDF().writeStream.format("memory").queryName("ss_asof")
        .outputMode("append").start()
      try {
        // batch 1: the LEFT arrives first — no matching right exists yet,
        // and the watermark (09:50/08:50 after this batch) holds it in state
        purchIn.addData((1L, 10L, ts("2024-01-01 10:00:00")))
        errIn.addData((90L, 99L, ts("2024-01-01 09:00:00"), 0.5))
        q.processAllAvailable()
        assert(spark.table("ss_asof").isEmpty,
          "left must be watermark-held, not emitted unmatched")

        // batch 2: the matching RIGHT arrives AFTER the left it must match
        // (09:30 < 10:00), in a later micro-batch — plus watermark movers
        errIn.addData((50L, 10L, ts("2024-01-01 09:30:00"), 1.5),
          (91L, 99L, ts("2024-01-01 10:40:00"), 0.5))
        purchIn.addData((2L, 10L, ts("2024-01-01 10:30:00")))
        q.processAllAvailable()

        // batches 3-4: sentinels push the watermark past both lefts (the
        // watermark used by batch N is computed from batch N-1's data)
        purchIn.addData((3L, 99L, ts("2024-01-01 12:00:00")))
        errIn.addData((92L, 99L, ts("2024-01-01 12:00:00"), 0.1))
        q.processAllAvailable()
        purchIn.addData((4L, 99L, ts("2024-01-01 13:00:00")))
        errIn.addData((93L, 99L, ts("2024-01-01 13:00:00"), 0.1))
        q.processAllAvailable()

        val out = spark.table("ss_asof").collect()
          .map(r => r.getAs[Long]("eventId") ->
            ((Option(r.getAs[Any]("errorId")), Option(r.getAs[Timestamp]("errorTs")))))
          .toMap
        // the cross-batch match: left 1 (10:00) joins error 50 (09:30)
        assert(out.contains(1L), s"left 1 never released; got ${out.keySet}")
        assert(out(1L) == ((Some(50L), Some(ts("2024-01-01 09:30:00")))))
        // left 2 (10:30): error 50 is still its latest at-or-before
        assert(out.contains(2L))
        assert(out(2L) == ((Some(50L), Some(ts("2024-01-01 09:30:00")))))

        // released rows ≡ batch AsOf.backward over the SAME fed data
        val batchLefts = Seq(
          (1L, 10L, ts("2024-01-01 10:00:00")),
          (2L, 10L, ts("2024-01-01 10:30:00")),
          (3L, 99L, ts("2024-01-01 12:00:00")),
          (4L, 99L, ts("2024-01-01 13:00:00"))
        ).toDF("event_id", "user_id", "ts")
        val batchRights = Seq(
          (90L, 99L, ts("2024-01-01 09:00:00"), 0.5),
          (50L, 10L, ts("2024-01-01 09:30:00"), 1.5),
          (91L, 99L, ts("2024-01-01 10:40:00"), 0.5),
          (92L, 99L, ts("2024-01-01 12:00:00"), 0.1),
          (93L, 99L, ts("2024-01-01 13:00:00"), 0.1)
        ).toDF("error_id", "e_user", "e_ts", "value")
        val expected = AsOf.backward(batchLefts, batchRights,
            "user_id", "e_user", "ts", "e_ts")
          .collect().map(r => r.getAs[Long]("event_id") ->
            ((Option(r.getAs[Any]("error_id")), Option(r.getAs[Timestamp]("e_ts")))))
          .toMap
        out.foreach { case (eid, got) =>
          assert(expected(eid) == got,
            s"stream diverged from batch on event $eid: $got vs ${expected(eid)}")
        }
      } finally q.stop()
    }
  }

  test("stream-stream FORWARD as-of: earliest right within tolerance wins across " +
    "batches; tolerance expiry null-extends; output equals batch AsOf.forward") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val leftIn = MemoryStream[(Long, Long, Timestamp)]
      val rightIn = MemoryStream[(Long, Long, Timestamp, Double)]
      val tolMs = 30L * 60L * 1000L // 30 minutes
      val joined = graft.streaming.StreamAsOf.asOfNextStreams(
        leftIn.toDF().toDF("event_id", "user_id", "ts"),
        rightIn.toDF().toDF("event_id", "user_id", "ts", "value"),
        toleranceMs = tolMs, watermark = "10 minutes")
      val q = joined.toDF().writeStream.format("memory").queryName("ss_fwd")
        .outputMode("append").start()
      try {
        // batch 1: LEFT first (10:00); its window is [10:00, 10:30] and no
        // right exists yet — must be held, not emitted
        leftIn.addData((1L, 10L, ts("2024-01-01 10:00:00")))
        rightIn.addData((900L, 99L, ts("2024-01-01 09:00:00"), 0.5))
        q.processAllAvailable()
        assert(spark.table("ss_fwd").isEmpty,
          "left must wait out its tolerance window before deciding")

        // batch 2: two in-window rights arrive LATER than the left —
        // the EARLIEST (10:20), not the first-arrived, must win
        rightIn.addData((51L, 10L, ts("2024-01-01 10:25:00"), 2.0),
          (50L, 10L, ts("2024-01-01 10:20:00"), 1.0))
        // a second left whose window [11:00, 11:30] will stay EMPTY
        leftIn.addData((2L, 10L, ts("2024-01-01 11:00:00")))
        q.processAllAvailable()

        // sentinels: walk the watermark past 10:30 (left 1 decidable) and
        // then past 11:30 (left 2 decidable, unmatched)
        for (h <- Seq("12:10", "12:20", "12:30")) {
          val hid = h.replace(":", "").toLong
          leftIn.addData((8000L + hid, 99L, ts(s"2024-01-01 $h:00")))
          rightIn.addData((7000L + hid, 99L, ts(s"2024-01-01 $h:00"), 0.1))
          q.processAllAvailable()
        }

        val out = spark.table("ss_fwd").collect()
          .map(r => r.getAs[Long]("eventId") ->
            ((Option(r.getAs[Any]("matchedId")), Option(r.getAs[Timestamp]("matchedTs")))))
          .toMap
        assert(out.contains(1L), s"left 1 never released; got ${out.keySet}")
        assert(out(1L) == ((Some(50L), Some(ts("2024-01-01 10:20:00")))),
          s"earliest in-window right must win: ${out(1L)}")
        assert(out.contains(2L), "empty-window left must still release")
        assert(out(2L) == ((None, None)), s"left 2 must null-extend: ${out(2L)}")

        // released rows ≡ batch AsOf.forward (same tolerance) on the SAME data
        val batchLefts = Seq(
          (1L, 10L, ts("2024-01-01 10:00:00")),
          (2L, 10L, ts("2024-01-01 11:00:00")),
          (9210L, 99L, ts("2024-01-01 12:10:00")),
          (9220L, 99L, ts("2024-01-01 12:20:00")),
          (9230L, 99L, ts("2024-01-01 12:30:00"))
        ).toDF("event_id", "user_id", "ts")
        val batchRights = Seq(
          (900L, 99L, ts("2024-01-01 09:00:00"), 0.5),
          (50L, 10L, ts("2024-01-01 10:20:00"), 1.0),
          (51L, 10L, ts("2024-01-01 10:25:00"), 2.0),
          (8210L, 99L, ts("2024-01-01 12:10:00"), 0.1),
          (8220L, 99L, ts("2024-01-01 12:20:00"), 0.1),
          (8230L, 99L, ts("2024-01-01 12:30:00"), 0.1)
        ).toDF("r_id", "r_user", "r_ts", "value")
        val expected = AsOf.forward(batchLefts, batchRights,
            "user_id", "r_user", "ts", "r_ts",
            tolerance = Some(tolMs * 1000L)) // micros for timestamp columns
          .collect().map(r => r.getAs[Long]("event_id") ->
            Option(r.getAs[Timestamp]("r_ts"))).toMap
        Seq(1L, 2L).foreach { eid =>
          assert(expected(eid) == out(eid)._2,
            s"stream diverged from batch on event $eid")
        }
      } finally q.stop()
    }
  }

  test("stream-stream as-of µs boundary: a same-millisecond right arriving a " +
    "batch after the watermark reached that millisecond still wins") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val purchIn = MemoryStream[(Long, Long, Timestamp)]
      val errIn = MemoryStream[(Long, Long, Timestamp, Double)]
      val joined = graft.streaming.StreamAsOf.asOfEnrichStreams(
        purchIn.toDF().toDF("event_id", "user_id", "ts"),
        errIn.toDF().toDF("error_id", "user_id", "ts", "value"),
        watermark = "10 minutes")
      val q = joined.toDF().writeStream.format("memory").queryName("ss_usb")
        .outputMode("append").start()
      try {
        // batch 1: left at 10:00:00.000800; movers on BOTH branches put the
        // watermark EXACTLY at the left's millisecond (10:10 floor-ms minus
        // the 10-min delay = 10:00:00.000 — Spark tracks watermarks in ms).
        // A ms-floor release gate would free the left right here.
        purchIn.addData((1L, 10L, ts("2024-01-01 10:00:00.0008")),
          (900L, 99L, ts("2024-01-01 10:10:00.0001")))
        errIn.addData((90L, 99L, ts("2024-01-01 10:10:00.0001"), 0.5))
        q.processAllAvailable()

        // batch 2: the matching right lands INSIDE the same millisecond
        // (.0003 ≤ .0008), admissible because its µs event time is ahead
        // of the ms watermark — the left must still be in state to see it
        errIn.addData((50L, 10L, ts("2024-01-01 10:00:00.0003"), 1.5))
        q.processAllAvailable()

        // movers: walk the watermark decisively past the left
        for (h <- Seq("10:40", "10:50")) {
          purchIn.addData((8000L + h.take(2).toLong * 10, 99L, ts(s"2024-01-01 $h:00")))
          errIn.addData((7000L + h.take(2).toLong * 10, 99L, ts(s"2024-01-01 $h:00"), 0.1))
          q.processAllAvailable()
        }

        val out = spark.table("ss_usb").collect()
          .map(r => r.getAs[Long]("eventId") ->
            ((Option(r.getAs[Any]("errorId")), Option(r.getAs[Timestamp]("errorTs")))))
          .toMap
        assert(out.contains(1L), s"boundary left never released: ${out.keySet}")
        assert(out(1L) == ((Some(50L), Some(ts("2024-01-01 10:00:00.0003")))),
          s"same-millisecond right must win (ms-floor gating loses it): ${out(1L)}")
      } finally q.stop()
    }
  }

  test("stream-stream FORWARD as-of µs boundary: a right in the window-end " +
    "millisecond arriving after the watermark reached it still wins") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val leftIn = MemoryStream[(Long, Long, Timestamp)]
      val rightIn = MemoryStream[(Long, Long, Timestamp, Double)]
      val tolMs = 30L * 60L * 1000L // 30 minutes
      val joined = graft.streaming.StreamAsOf.asOfNextStreams(
        leftIn.toDF().toDF("event_id", "user_id", "ts"),
        rightIn.toDF().toDF("event_id", "user_id", "ts", "value"),
        toleranceMs = tolMs, watermark = "10 minutes")
      val q = joined.toDF().writeStream.format("memory").queryName("ss_fwd_usb")
        .outputMode("append").start()
      try {
        // batch 1: left at 10:00:00.000200 — window [10:00:00.000200,
        // 10:30:00.000200]; movers put the watermark EXACTLY at the
        // window end's millisecond (10:40 − 10 min = 10:30:00.000)
        leftIn.addData((1L, 10L, ts("2024-01-01 10:00:00.0002")),
          (910L, 99L, ts("2024-01-01 10:40:00.0001")))
        rightIn.addData((90L, 99L, ts("2024-01-01 10:40:00.0001"), 0.5))
        q.processAllAvailable()

        // batch 2: an in-window right inside the boundary millisecond
        // (10:30:00.000100 ≤ window end .000200) — a ms-floor release
        // would already have freed the left as unmatched
        rightIn.addData((50L, 10L, ts("2024-01-01 10:30:00.0001"), 1.0))
        q.processAllAvailable()

        for (h <- Seq("11:40", "11:50")) {
          leftIn.addData((8000L + h.take(2).toLong * 10, 99L, ts(s"2024-01-01 $h:00")))
          rightIn.addData((7000L + h.take(2).toLong * 10, 99L, ts(s"2024-01-01 $h:00"), 0.1))
          q.processAllAvailable()
        }

        val out = spark.table("ss_fwd_usb").collect()
          .map(r => r.getAs[Long]("eventId") ->
            ((Option(r.getAs[Any]("matchedId")), Option(r.getAs[Timestamp]("matchedTs")))))
          .toMap
        assert(out.contains(1L), s"boundary left never released: ${out.keySet}")
        assert(out(1L) == ((Some(50L), Some(ts("2024-01-01 10:30:00.0001")))),
          s"window-end-millisecond right must win: ${out(1L)}")
      } finally q.stop()
    }
  }

  test("stream-stream as-of killed under fire: buffered lefts, right state, and " +
    "timers all survive the checkpoint restart; output equals batch") {
    import spark.implicits._
    withRocksDb {
      val pDir = java.nio.file.Files.createTempDirectory("graft-ssasof-p").toString
      val eDir = java.nio.file.Files.createTempDirectory("graft-ssasof-e").toString
      val ckpt = java.nio.file.Files.createTempDirectory("graft-ssasof-ck").toString
      def addP(rows: (Long, Long, Timestamp)*): Unit =
        rows.toSeq.toDF("event_id", "user_id", "ts")
          .coalesce(1).write.mode("append").parquet(pDir)
      def addE(rows: (Long, Long, Timestamp, Double)*): Unit =
        rows.toSeq.toDF("error_id", "user_id", "ts", "value")
          .coalesce(1).write.mode("append").parquet(eDir)
      val pSchema = "event_id LONG, user_id LONG, ts TIMESTAMP"
      val eSchema = "error_id LONG, user_id LONG, ts TIMESTAMP, value DOUBLE"
      val emissions = new scala.collection.mutable.ArrayBuffer[
        graft.streaming.StreamAsOf.StreamAsOfJoined]()
      def start() =
        graft.streaming.StreamAsOf.asOfEnrichStreams(
            spark.readStream.schema(pSchema).parquet(pDir),
            spark.readStream.schema(eSchema).parquet(eDir),
            watermark = "10 minutes")
          .writeStream.outputMode("append")
          .option("checkpointLocation", ckpt)
          .foreachBatch { (ds: org.apache.spark.sql.Dataset[
            graft.streaming.StreamAsOf.StreamAsOfJoined], id: Long) =>
            emissions.synchronized { emissions ++= ds.collect() }; ()
          }
          .start()

      val q1 = start()
      // committed state: a buffered left (awaits both its match and the
      // watermark) plus a right that must survive dominance pruning
      addP((1L, 10L, ts("2024-01-01 10:00:00")))
      addE((40L, 10L, ts("2024-01-01 09:10:00"), 9.0))
      q1.processAllAvailable()
      // KILL UNDER FIRE: the decisive right (09:30, later than 09:10 —
      // must win) lands as a pending uncommitted file when stop() hits
      addE((50L, 10L, ts("2024-01-01 09:30:00"), 1.5))
      q1.stop()

      val q2 = start()
      q2.processAllAvailable()
      // sentinels walk the watermark past the buffered left — two batches,
      // because batch N uses the watermark computed from batch N-1
      for (h <- Seq("12:00", "13:00", "14:00")) {
        addP((8000L + h.take(2).toLong, 99L, ts(s"2024-01-01 $h:00")))
        addE((7000L + h.take(2).toLong, 99L, ts(s"2024-01-01 $h:00"), 0.1))
        q2.processAllAvailable()
      }
      q2.stop()

      val got = emissions.synchronized {
        emissions.filter(_.userId == 10L)
          .map(e => e.eventId -> ((e.errorId, e.errorTs))).toMap
      }
      // the pre-kill left survived the restart AND matched the right that
      // arrived in the killed batch — not the older committed right
      assert(got.get(1L).isDefined, s"left 1 lost across restart: $emissions")
      assert(got(1L) == ((Some(50L), Some(ts("2024-01-01 09:30:00")))), got)
      // each left decided exactly once (no timer double-fire after restart)
      emissions.synchronized {
        val perLeft = emissions.groupBy(e => e.eventId)
          .map { case (k, es) => k -> es.map(e => e.errorId).distinct.size }
        assert(perLeft.values.forall(_ == 1), s"conflicting re-decisions: $perLeft")
      }
    }
  }

  test("stream-stream as-of: dominance pruning keeps exact matches for " +
    "future lefts, and a late left is dropped (watermark contract)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val purchIn = MemoryStream[(Long, Long, Timestamp)]
      val errIn = MemoryStream[(Long, Long, Timestamp, Double)]
      val joined = graft.streaming.StreamAsOf.asOfEnrichStreams(
        purchIn.toDF().toDF("event_id", "user_id", "ts"),
        errIn.toDF().toDF("error_id", "user_id", "ts", "value"),
        watermark = "10 minutes")
      val q = joined.toDF().writeStream.format("memory").queryName("ss_asof2")
        .outputMode("append").start()
      try {
        // two rights for user 10, both destined to fall at-or-before the
        // watermark: only the later (09:40) may be kept by the prune
        errIn.addData((50L, 10L, ts("2024-01-01 09:20:00"), 1.0),
          (51L, 10L, ts("2024-01-01 09:40:00"), 2.0))
        purchIn.addData((900L, 99L, ts("2024-01-01 09:00:00")))
        q.processAllAvailable()
        // push the watermark well past both rights (to ~11:50) and force a
        // timer sweep for key 10 via a left that immediately releases later
        purchIn.addData((1L, 10L, ts("2024-01-01 10:00:00")))
        errIn.addData((90L, 99L, ts("2024-01-01 12:00:00"), 0.1))
        q.processAllAvailable()
        purchIn.addData((901L, 99L, ts("2024-01-01 12:00:00")))
        errIn.addData((91L, 99L, ts("2024-01-01 12:30:00"), 0.1))
        q.processAllAvailable()
        val out1 = spark.table("ss_asof2").collect()
          .map(r => r.getAs[Long]("eventId") -> Option(r.getAs[Any]("errorId"))).toMap
        assert(out1.get(1L) == Some(Some(51L)),
          s"left 1 must match the dominant right 51, got $out1")

        // a FUTURE left (ahead of the watermark) must still find right 51:
        // the prune may only discard DOMINATED rows, never the latest one
        purchIn.addData((3L, 10L, ts("2024-01-01 12:40:00")))
        q.processAllAvailable()
        purchIn.addData((902L, 99L, ts("2024-01-01 13:30:00")))
        errIn.addData((93L, 99L, ts("2024-01-01 13:30:00"), 0.1))
        q.processAllAvailable()
        val out2 = spark.table("ss_asof2").collect()
          .map(r => r.getAs[Long]("eventId") -> Option(r.getAs[Any]("errorId"))).toMap
        assert(out2.get(3L) == Some(Some(51L)),
          s"post-prune left must still match the dominant right, got $out2")

        // LATE left: ts 10:30 is far behind the current watermark — the
        // event-time filter drops it before the processor (the same
        // contract as Spark's built-in stream-stream joins), so it never
        // emits, matched or otherwise
        purchIn.addData((2L, 10L, ts("2024-01-01 10:30:00")))
        q.processAllAvailable()
        purchIn.addData((903L, 99L, ts("2024-01-01 14:00:00")))
        errIn.addData((94L, 99L, ts("2024-01-01 14:00:00"), 0.1))
        q.processAllAvailable()
        val out3 = spark.table("ss_asof2").collect()
          .map(r => r.getAs[Long]("eventId") -> Option(r.getAs[Any]("errorId"))).toMap
        assert(!out3.contains(2L),
          s"late left must be dropped by the watermark filter, got $out3")
      } finally q.stop()
    }
  }
}
