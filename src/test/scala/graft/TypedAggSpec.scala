package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.model.TripStation
import graft.operators.TypedAgg

/** The typed Aggregator (reference Transformer parity, SURVEY.md §2.7)
  * agrees with the declarative path, and its buffer algebra is associative —
  * the property that makes it distributable. */
class TypedAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val agg = new TypedAgg.StationDayAggregator

  test("merge of any split equals a single serial reduce (associativity)") {
    val rnd = new scala.util.Random(7)
    val types = Vector("purchase", "view", "error")
    (1 to 20).foreach { trial =>
      val ts = List.fill(1 + rnd.nextInt(40)) {
        TripStation("S",
          Timestamp.valueOf(f"2024-01-01 ${rnd.nextInt(24)}%02d:00:00"),
          types(rnd.nextInt(3)), rnd.nextDouble() * 75 - 30)
      }
      val cut = rnd.nextInt(ts.length + 1)
      val serial = ts.foldLeft(agg.zero)(agg.reduce)
      val (a, b) = ts.splitAt(cut)
      val merged = agg.merge(
        a.foldLeft(agg.zero)(agg.reduce),
        b.foldLeft(agg.zero)(agg.reduce))
      assert(merged.started == serial.started, s"trial $trial")
      assert(merged.ended == serial.ended)
      assert(merged.tempCount == serial.tempCount)
      assert(merged.maxTime == serial.maxTime)
      // decimal buffer: ANY split merges to the bit-identical sum — the
      // exactness that makes the typed mean hash-gateable (round 14)
      assert(merged.tempSum.compareTo(serial.tempSum) == 0)
    }
  }

  test("typed groupByKey aggregation matches the incremental-mean semantics") {
    import spark.implicits._
    val data = Seq(
      TripStation("A", Timestamp.valueOf("2024-01-01 10:00:00"), "purchase", 10.0),
      TripStation("A", Timestamp.valueOf("2024-01-01 12:00:00"), "view", 30.0),
      TripStation("B", Timestamp.valueOf("2024-01-01 09:00:00"), "view", 5.0))
    val out = data.toDS()
      .groupByKey(_.stationName)
      .agg(agg.toColumn)
      .collect()
      .toMap
    assert(out("A").startedTrips == 1L)
    assert(out("A").endedTrips == 1L)
    assert(out("A").avgTemperature.contains(20.0))
    assert(out("A").updateTime == Timestamp.valueOf("2024-01-01 12:00:00"))
    assert(out("B").endedTrips == 1L)
  }

  test("NULL temperatures skip the mean like COUNT(value), not the row") {
    import spark.implicits._
    // the events table's `value` is nullable; a null decodes as None and
    // must contribute to started/ended (COUNT(*)) but to NEITHER tempSum
    // NOR tempCount (COUNT(e.value)) — round-15 advisor
    val data = Seq(
      TripStation("A", Timestamp.valueOf("2024-01-01 10:00:00"), "purchase", 10.0),
      TripStation("A", Timestamp.valueOf("2024-01-01 11:00:00"), "view",
        None: Option[Double]),
      TripStation("A", Timestamp.valueOf("2024-01-01 12:00:00"), "view", 30.0),
      // an ALL-NULL group: the mean is SQL NULL (None), never an invented 0
      TripStation("B", Timestamp.valueOf("2024-01-01 09:00:00"), "view",
        None: Option[Double]))
    val out = data.toDS()
      .groupByKey(_.stationName)
      .agg(agg.toColumn)
      .collect()
      .toMap
    assert(out("A").startedTrips == 1L)
    assert(out("A").endedTrips == 2L)     // the null row still counted
    assert(out("A").avgTemperature.contains(20.0)) // (10+30)/2, null skipped
    assert(out("B").endedTrips == 1L)
    assert(out("B").avgTemperature.isEmpty)
  }
}
