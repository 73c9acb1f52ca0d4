package graft.model

import java.sql.{Date, Timestamp}

/** Typed surface of the engine — the Dataset[T] analogs of the reference's
  * Kotlin data classes (reference/src/com/bigdata/model package). Used by the
  * typed aggregation and streaming paths; the DataFrame operators stay
  * schema-dynamic.
  */

/** Raw trip event (reference/src/com/bigdata/model/Trip.kt:6-17, projected
  * onto the driver's events table per FIXTURES.md: event_type plays the
  * started/ended flag, value is the temperature). */
final case class Trip(
    tripId: Long,
    tripTime: Timestamp,
    tripType: String,
    stationId: Long,
    temperature: Double)

/** Static station dimension (reference/src/com/bigdata/model/Station.kt:3-12
  * ↔ the supplier table). */
final case class Station(
    stationKey: Long,
    stationName: String,
    stationNation: Int,
    stationAcctbal: Double)

/** Denormalized join output (reference/src/com/bigdata/model/TripStation.kt:6-24,
  * narrowed to the fields the aggregation actually reads — the reference
  * carries all 17 but consumes 4, SURVEY.md §4 column-pruning note).
  *
  * `temperature` is an Option (round-15 advisor): the source column is the
  * events table's nullable `value`, and a primitive Double field cannot
  * DECODE a null row — the typed path would have crashed the moment a NULL
  * value appeared, where the declarative `avg` and the oracle's
  * `COUNT(e.value)` both just skip it. Option[Double] decodes null as None
  * and the typed aggregator skips it identically ([[graft.operators.TypedAgg]]). */
final case class TripStation(
    stationName: String,
    tripTime: Timestamp,
    tripType: String,
    temperature: Option[Double])

object TripStation {
  /** Present-value convenience constructor (specs and fixtures). */
  def apply(stationName: String, tripTime: Timestamp, tripType: String,
            temperature: Double): TripStation =
    TripStation(stationName, tripTime, tripType, Some(temperature))
}

/** Per-(station, day) aggregate
  * (reference/src/com/bigdata/model/AggregatedInfo.kt:6-12).
  * `avgTemperature` is an Option for the same reason `TripStation.temperature`
  * is: a group whose every temperature is NULL averages to NULL — the
  * declarative `avg` and the oracle's `SUM(value)/COUNT(value)` both return
  * NULL there, and a primitive field would have to invent a 0.0. */
final case class AggregatedInfo(
    stationName: String,
    eventDay: Date,
    startedTrips: Long,
    endedTrips: Long,
    avgTemperature: Option[Double],
    updateTime: Timestamp)
