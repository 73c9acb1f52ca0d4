package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TripEtl

/** Units for the reference-parity operators: J1 (incl. strict mode), A2-A7
  * edge cases, T1 invalid-timestamp drop, window semantics. */
class TripEtlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  /** events-shaped frame: (event_id, ts, user_id, event_type, value, props) */
  private def eventsDf(rows: (Long, String, Long, String, Double)*): DataFrame =
    rows.toSeq
      .map { case (id, t, uid, typ, v) => (id, ts(t), uid, typ, v, s"""{"k":$id}""") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  /** supplier-shaped dimension covering station ids 0..9. */
  private def stationsDf(keys: Long*): DataFrame =
    keys.map(k => (k, s"Station#$k", k.toInt, k * 10.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")

  test("enrichTrips joins each event to its station and parses the payload") {
    val out = TripEtl.enrichTrips(
      eventsDf((1L, "2024-01-01 10:00:00", 13L, "purchase", 20.0)),
      stationsDf(0L to 9L: _*)).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("station_name") == "Station#3") // 13 % 10
    assert(r.getAs[Int]("prop_k") == 1)
    assert(r.getAs[String]("trip_type") == "purchase")
  }

  test("enrichTripsStrict passes on clean data and throws on a dangling FK") {
    val clean = TripEtl.enrichTripsStrict(
      eventsDf((1L, "2024-01-01 10:00:00", 3L, "purchase", 20.0)),
      stationsDf(0L to 9L: _*)).collect()
    assert(clean.length == 1)

    val missing7 = stationsDf((0L to 9L).filterNot(_ == 7L): _*)
    val ex = intercept[Exception] {
      TripEtl.enrichTripsStrict(
        eventsDf((1L, "2024-01-01 10:00:00", 17L, "purchase", 20.0)),
        missing7).collect()
    }
    assert(ex.getMessage.contains("No such station: 7"))
  }

  test("danglingStationFks counts events with no dimension match") {
    val out = TripEtl.danglingStationFks(
      eventsDf(
        (1L, "2024-01-01 10:00:00", 3L, "purchase", 1.0),
        (2L, "2024-01-01 11:00:00", 42L, "view", 1.0),
        (3L, "2024-01-01 12:00:00", 42L, "view", 1.0)),
      stationsDf(0L to 9L: _*)).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("user_id") == 42L)
    assert(out.head.getAs[Long]("n_dangling") == 2L)
  }

  test("stationDayAgg: all-started group, avg over group, max update time") {
    val enriched = TripEtl.enrichTrips(
      eventsDf(
        (1L, "2024-01-01 10:00:00", 3L, "purchase", 10.0),
        (2L, "2024-01-01 18:00:00", 3L, "purchase", 30.0),
        (3L, "2024-01-02 01:00:00", 3L, "view", 5.0)),
      stationsDf(0L to 9L: _*))
    val out = TripEtl.stationDayAgg(enriched)
      .orderBy("event_day").collect()
    assert(out.length == 2)
    val day1 = out.head
    assert(day1.getAs[Long]("started_trips") == 2L)
    assert(day1.getAs[Long]("ended_trips") == 0L)
    assert(day1.getAs[Double]("avg_temperature") == 20.0)
    assert(day1.getAs[Timestamp]("update_time") == ts("2024-01-01 18:00:00"))
    val day2 = out(1)
    assert(day2.getAs[Long]("started_trips") == 0L)
    assert(day2.getAs[Long]("ended_trips") == 1L)
  }

  test("windowAnomalies: ended==started gives ratio 0; both greatest branches") {
    val enriched = TripEtl.enrichTrips(
      eventsDf(
        // station 3, window 1: 1 started + 1 ended -> ratio 0, no anomaly
        (1L, "2024-01-01 00:10:00", 3L, "purchase", 1.0),
        (2L, "2024-01-01 00:20:00", 3L, "view", 1.0),
        // station 4 (total_docks 5), window 1: 3 ended -> ratio 0.6 > 0.5
        (3L, "2024-01-01 00:10:00", 4L, "view", 1.0),
        (4L, "2024-01-01 00:20:00", 4L, "view", 1.0),
        (5L, "2024-01-01 00:30:00", 4L, "view", 1.0),
        // station 5 (total_docks 6), window 2: 2 started -> ratio ~0.333
        (6L, "2024-01-01 06:10:00", 5L, "purchase", 1.0),
        (7L, "2024-01-01 06:20:00", 5L, "purchase", 1.0)),
      stationsDf(0L to 9L: _*))
    val out = TripEtl.windowAnomalies(enriched, 360, 50)
      .orderBy("window_start", "station_name").collect()
    assert(out.length == 3)

    val balanced = out.find(_.getAs[String]("station_name") == "Station#3").get
    assert(balanced.getAs[Long]("returned_over_rented") == 0L)
    assert(balanced.getAs[Long]("rented_over_returned") == 0L)
    assert(balanced.getAs[Double]("n_to_docks_ratio") == 0.0)
    assert(!balanced.getAs[Boolean]("is_anomaly"))

    val returns = out.find(_.getAs[String]("station_name") == "Station#4").get
    assert(returns.getAs[Long]("returned_over_rented") == 3L)
    assert(returns.getAs[Long]("rented_over_returned") == 0L)
    assert(returns.getAs[Double]("n_to_docks_ratio") == 0.6)
    assert(returns.getAs[Boolean]("is_anomaly"))

    val rents = out.find(_.getAs[String]("station_name") == "Station#5").get
    assert(rents.getAs[Long]("returned_over_rented") == 0L)
    assert(rents.getAs[Long]("rented_over_returned") == 2L)
    assert(!rents.getAs[Boolean]("is_anomaly"))
  }

  test("windowAnomalies physical plan contains no collect_list (scale path)") {
    val enriched = TripEtl.enrichTrips(
      eventsDf((1L, "2024-01-01 00:10:00", 3L, "purchase", 1.0)),
      stationsDf(0L to 9L: _*))
    val plan = TripEtl.windowAnomalies(enriched, 360, 50)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("collect_list"))
  }

  test("windowCounts keeps sorted event_times; capped variant bounds them") {
    val enriched = TripEtl.enrichTrips(
      eventsDf(
        (1L, "2024-01-01 00:30:00", 3L, "purchase", 1.0),
        (2L, "2024-01-01 00:10:00", 3L, "view", 1.0),
        (3L, "2024-01-01 00:20:00", 3L, "view", 1.0)),
      stationsDf(0L to 9L: _*))
    val full = TripEtl.windowCounts(enriched, 360).collect().head
    val times = full.getSeq[Timestamp](full.fieldIndex("event_times"))
    assert(times == times.sorted(Ordering.by((t: Timestamp) => t.getTime)))
    assert(times.length == 3)

    val capped = TripEtl.windowCountsCapped(enriched, 360, 2).collect().head
    assert(capped.getSeq[Timestamp](capped.fieldIndex("event_times")).length == 2)
    assert(capped.getAs[Long]("started") == 1L) // counts unaffected by the cap
  }

  test("incremental state merge finalizes to the one-shot aggregate, any split") {
    import graft.operators.Incremental
    val dir = "/root/testdata/sf0.001"
    val enriched = TripEtl.enrichTrips(
      graft.sources.Tables.events(spark, dir),
      graft.sources.Tables.supplier(spark, dir))
    val oneShot = TripEtl.stationDayAgg(enriched)
    // two DIFFERENT splits must both finalize to the identical table —
    // the associativity the stored-state design depends on
    Seq(2, 7).foreach { mod =>
      val inc = Incremental.stationDayAggIncremental(enriched, mod)
      assert(inc.exceptAll(oneShot).count() == 0 &&
        oneShot.exceptAll(inc).count() == 0, s"mod=$mod")
    }
    // an empty new batch is a no-op merge (ingest idles, rollup unchanged)
    val all = Incremental.stationDayAggState(enriched)
    val none = Incremental.stationDayAggState(enriched.filter(lit(false)))
    val merged = Incremental.finalizeState(Incremental.mergeStates(all, none))
    assert(merged.exceptAll(oneShot).count() == 0 &&
      oneShot.exceptAll(merged).count() == 0)
  }

  test("parseTrips drops records with invalid/missing timestamps (T1)") {
    val raw = Seq(
      """{"tripId":1,"tripTime":"2024-01-01T10:00:00.000Z","tripType":"purchase","stationId":3,"temperature":20.0}""",
      """{"tripId":2,"tripType":"view","stationId":4,"temperature":1.0}""",
      """not json at all""",
      """{"tripId":3,"tripTime":"garbage","tripType":"view","stationId":5,"temperature":1.0}"""
    ).toDF("value")
    val out = TripEtl.parseTrips(raw).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("tripId") == 1L)
  }
}
