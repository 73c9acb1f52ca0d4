package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.DeterministicAgg.roundFixed

/** Incremental aggregate maintenance — the pattern that keeps a 100 TB
  * pipeline from rescanning history on every ingest: the public aggregate
  * ([[TripEtl.stationDayAgg]]) is re-expressed as a MERGEABLE state table
  * (every column either additive or max/min — the non-mergeable `avg`
  * becomes the pair (decimal sum, count) and is only divided at the edge),
  * so updating the rollup after a new batch is
  *
  *   finalize( merge( storedState, state(newBatch) ) )
  *
  * — one partial agg over the NEW data plus one merge agg whose left side
  * is the (group-cardinality-sized, not event-sized) state table. The
  * decimal-backed temperature sum is the same
  * [[graft.functions.DeterministicAgg]] arithmetic the one-shot aggregate
  * uses, and decimal addition is associative, so ANY split of the event
  * stream finalizes to the bit-identical public aggregate — the driver
  * proves it by hash-matching `station_day_agg_incremental` against the
  * SAME oracle SQL as the one-shot `station_day_agg`.
  */
object Incremental {
  private val keys = Seq(col("station_name"), col("event_day"))

  /** The mergeable state of [[TripEtl.stationDayAgg]] for one event slice:
    * additive counts, the WIDE (decimal) temperature sum kept undivided
    * and unrounded — rounding before the merge would destroy
    * associativity — and the running max. */
  def stationDayAggState(enriched: DataFrame): DataFrame =
    enriched
      .withColumn("event_day", to_date(col("trip_time")))
      .groupBy(keys: _*)
      .agg(
        sum(when(TripEtl.isStarted(col("trip_type")), 1L).otherwise(0L))
          .as("started_trips"),
        sum(when(TripEtl.isStarted(col("trip_type")), 0L).otherwise(1L))
          .as("ended_trips"),
        sum(col("temperature").cast("decimal(38,10)")).as("temp_sum"),
        count(col("temperature")).as("temp_cnt"),
        max(col("trip_time")).as("update_time"))

  /** Merge two state tables: one hash agg over the union — every column
    * re-aggregates with its own merge function. Decimal sums add exactly;
    * `sum` skips a slice where the group had no temperatures (null
    * temp_sum), matching the one-shot aggregate's null handling. */
  def mergeStates(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(keys: _*)
      .agg(
        sum(col("started_trips")).as("started_trips"),
        sum(col("ended_trips")).as("ended_trips"),
        sum(col("temp_sum")).as("temp_sum"),
        sum(col("temp_cnt")).as("temp_cnt"),
        max(col("update_time")).as("update_time"))

  /** Divide and round at the edge — after this the table is the public
    * [[TripEtl.stationDayAgg]] shape (and value-identical to it). */
  def finalizeState(state: DataFrame): DataFrame =
    state.select(
      col("station_name"), col("event_day"),
      col("started_trips"), col("ended_trips"),
      when(col("temp_cnt") === 0L, lit(null).cast("double"))
        .otherwise(roundFixed(
          col("temp_sum").cast("double") / col("temp_cnt"), 4))
        .as("avg_temperature"),
      col("update_time"))

  /** The driver-facing composition: split the stream deterministically into
    * a "history" slice and a "new batch" slice (trip_id mod — content
    * stable), build each slice's state, merge, finalize. Equals the
    * one-shot aggregate over all events by construction. */
  def stationDayAggIncremental(enriched: DataFrame, mod: Int = 5): DataFrame = {
    val history = enriched.filter(pmod(col("trip_id"), lit(mod.toLong)) =!= 0L)
    val fresh = enriched.filter(pmod(col("trip_id"), lit(mod.toLong)) === 0L)
    finalizeState(mergeStates(
      stationDayAggState(history), stationDayAggState(fresh)))
  }
}
