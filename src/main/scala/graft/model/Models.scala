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
  * carries all 17 but consumes 4, SURVEY.md §4 column-pruning note). */
final case class TripStation(
    stationName: String,
    tripTime: Timestamp,
    tripType: String,
    temperature: Double)

/** Per-(station, day) aggregate
  * (reference/src/com/bigdata/model/AggregatedInfo.kt:6-12). */
final case class AggregatedInfo(
    stationName: String,
    eventDay: Date,
    startedTrips: Long,
    endedTrips: Long,
    avgTemperature: Double,
    updateTime: Timestamp)
