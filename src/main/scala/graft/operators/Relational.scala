package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.DeterministicAgg.{avgRounded, roundFixed, sumRounded}

/** Relational coverage beyond the reference's single join/agg (SURVEY.md
  * §2.8): multi-way joins, sort/limit top-k, analytic window functions,
  * distinct aggregation. The reference has none of these; a Spark engine
  * gets them from Catalyst — these entries pin the semantics under the
  * DuckDB oracle and serve as the bench headliners on `lineitem`.
  */
object Relational {

  /** TPC-H Q1-shaped pricing summary — the volume-table bench headline.
    * Scans only the 7 needed columns (ColumnPruning reaches the parquet
    * scan); one hash aggregation with map-side partials over a low-NDV key,
    * so shuffle traffic is O(#groups × #partitions), not O(rows).
    */
  /** SPREAD a sub-parallel lineitem scan ahead of a decimal-heavy
    * single-pass aggregate (round-16 optimization; the covarianceMatrix /
    * media-kernel discipline applied to the pricing family). The driver's
    * lineitem is one single-row-group parquet file = ONE input split, so
    * the partial aggregation — several `cast(x as decimal(38,10))` per row,
    * the real per-row cost here — ran on one core of 32 (pricing_cube
    * measured 1.81 → 1.11 s at sf0.1). Hash on l_extendedprice: ~600k
    * distinct values spread evenly, and the column is already in every
    * pricing aggregate's read set, so ReadSchema (column pruning) is
    * unchanged. Skipped whenever the scan already spans the cluster — at
    * 100 TB the plan is identical. A READER-level version of this spread
    * was A/B'd and rejected (see Tables.read): it pays only immediately
    * ahead of heavy per-row work, which these three aggregates are. */
  private def spreadForPricing(lineitem: DataFrame): DataFrame =
    Spread.byKey(lineitem, col("l_extendedprice"))

  def pricingSummary(lineitem: DataFrame): DataFrame =
    spreadForPricing(lineitem)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        // exactSum, not a plain double sum (round-16 advisor): the spread
        // makes partial-merge order partitioning-dependent, and the
        // order-independence of a double sum must not rest on the DATA
        // happening to be integral. Values are unchanged on integral
        // quantities (sums ≪ 2^53), so the oracle hash is untouched.
        graft.functions.DeterministicAgg.exactSum(col("l_quantity")).as("sum_qty"),
        sumRounded(col("l_extendedprice"), 2).as("sum_base_price"),
        sumRounded(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 2)
          .as("sum_disc_price"),
        avgRounded(col("l_quantity"), 4).as("avg_qty"),
        avgRounded(col("l_extendedprice"), 4).as("avg_price"),
        count(lit(1)).as("count_order")
      )

  /** Shared exact-decimal base aggregation of the ROLLUP/CUBE pair
    * (round-17 optimization): grouping-set expansion multiplies every
    * input row by the number of grouping sets BEFORE the partial
    * aggregation, so the per-row decimal casts — the real cost of the
    * pricing aggregates — ran 3x (rollup) / 4x (cube). Decimal addition
    * is exact and associative, so aggregating to the (returnflag,
    * linestatus) base ONCE and expanding the ≤|flag|·|status|-row base
    * relation instead produces bit-identical sums at every level; counts
    * re-add exactly. The expensive pass now happens once, and the Expand
    * touches metadata-scale rows. */
  private def pricingBase(lineitem: DataFrame): DataFrame = {
    val wide = org.apache.spark.sql.types.DecimalType(38, 10)
    spreadForPricing(lineitem)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("b_n"),
        sum(col("l_quantity").cast(wide)).as("b_q"),
        sum(col("l_extendedprice").cast(wide)).as("b_p"))
  }

  /** Three-deep dimension join: orders ⋈ customer ⋈ nation ⋈ region →
    * revenue per (region, nation). nation/region are FIXED-cardinality
    * (25/5 rows at any SF) so they carry explicit broadcast hints;
    * `customer` GROWS with SF, so it gets NO hint — Spark's stats gate
    * (parquet sizeInBytes vs autoBroadcastJoinThreshold) + AQE choose
    * broadcast while it fits and fall back to shuffle join when it
    * outgrows executor memory at 100 TB. PlanRegressionSpec pins BHJ
    * at test SF without the hint.
    */
  def regionRevenue(orders: DataFrame, customer: DataFrame,
                    nation: DataFrame, region: DataFrame): DataFrame =
    orders
      .join(customer, orders("o_custkey") === customer("c_custkey"))
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        sumRounded(col("o_totalprice"), 2).as("revenue"),
        count(lit(1)).as("n_orders")
      )

  /** Top-k by aggregate with deterministic tie-break — sort + limit after a
    * hash agg; Spark plans a TakeOrderedAndProject, so only k rows per
    * partition ever reach the driver-side final ordering. `customer` is
    * SF-growing → no broadcast hint (stats/AQE gate it; see
    * [[regionRevenue]]).
    */
  def topCustomers(orders: DataFrame, customer: DataFrame, k: Int): DataFrame =
    orders
      .join(customer, orders("o_custkey") === customer("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(sumRounded(col("o_totalprice"), 2).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(k)

  /** Analytic window functions (rank within partition + lag-based deltas):
    * per-customer order sequencing. One shuffle on the partition key; the
    * sort inside each partition is the window operator's own.
    */
  def orderSequence(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    orders
      .select(
        col("o_custkey"),
        col("o_orderkey"),
        col("o_orderdate"),
        row_number().over(w).as("order_seq"),
        roundFixed(col("o_totalprice") -
          coalesce(lag(col("o_totalprice"), 1).over(w), lit(0.0)), 2)
          .as("price_delta")
      )
      .filter(col("order_seq") <= 3)
  }

  /** Distinct + conditional aggregation per user over the event stream:
    * event counts, distinct active days, value quantiles by event class.
    */
  def userActivity(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(to_date(col("ts"))).as("active_days"),
        sumRounded(when(col("event_type") === "purchase", col("value")).otherwise(0.0), 2)
          .as("purchase_value"),
        max(col("ts")).as("last_seen")
      )

  /** AS-OF JOIN, Spark-first: for every purchase, the most recent error of
    * the same user at-or-before the purchase time.
    *
    * Spark has no asof operator; rather than a range-join (O(n·m) worst
    * case) this is the single-pass formulation: tag both event classes,
    * sort each user's timeline once, and carry the last error timestamp
    * forward with `last(_, ignoreNulls)` over an unbounded-preceding
    * window. ONE shuffle on user_id, no join at all — and because state is
    * "last value seen", the same shape runs incrementally under streaming.
    * Ties (error at the identical instant) count as preceding — the
    * secondary sort key puts errors first — matching DuckDB's
    * `ASOF JOIN ... ON p.ts >= e.ts`, which the oracle uses.
    */
  def lastErrorBeforePurchase(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("is_error").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .filter(col("event_type").isin("purchase", "error"))
      .withColumn("is_error", (col("event_type") === "error").cast("int"))
      .withColumn("last_error_ts",
        last(when(col("is_error") === 1, col("ts")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("last_error_ts"))
  }

  /** RANGE-frame window (time-based sliding aggregation — §2.8 coverage,
    * and the bounded formulation of a self range-join): per event, how many
    * same-user events fall in the preceding hour (inclusive). One shuffle
    * on user_id; the range frame advances a pointer over each sorted
    * partition — O(n) per user, versus the O(n²) naive theta self-join.
    */
  def eventsInPrecedingHour(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(unix_micros(col("ts")))
      .rangeBetween(-3600L * 1000000L, 0L)
    events.select(
      col("event_id"), col("user_id"), col("ts"),
      count(lit(1)).over(w).as("events_last_hour"))
  }

  /** HOPPING (sliding) windows — the missing member of the windowing
    * family (tumbling = T5/[[graft.operators.TripEtl.windowCountsBase]],
    * session = [[sessionize]], range-frame = [[eventsInPrecedingHour]]):
    * overlapping fixed windows of `widthMinutes` advancing every
    * `slideMinutes`, the standard shape for smoothed dashboards and
    * rolling-rate alerting. Spark's `window(ts, width, slide)` expands
    * each row into its width/slide containing windows (one Expand + one
    * hash agg — a single shuffle); the deliberate row amplification IS the
    * operator's cost model, so keep width/slide small (here 4×). The
    * per-window aggregate state stays O(groups), partial-agg combined
    * map-side — at 100 TB the plan is identical, just wider.
    *
    * Determinism: null timestamps are dropped explicitly (a null window
    * key row would be engine-ambiguous), the value sum runs
    * decimal-backed ([[sumRounded]]).
    */
  def hoppingCounts(events: DataFrame, widthMinutes: Int = 360,
                    slideMinutes: Int = 90): DataFrame = {
    require(widthMinutes % slideMinutes == 0,
      "width must be a multiple of slide (Spark window() contract)")
    events
      .filter(col("ts").isNotNull)
      .groupBy(
        window(col("ts"), s"$widthMinutes minutes", s"$slideMinutes minutes"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sumRounded(col("value"), 2).as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("sum_value"))
  }

  /** TWAP — time-weighted average of an irregularly-sampled value per
    * (user, day), under step (sample-and-hold) interpolation: each
    * sample's weight is the seconds until the user's NEXT sample that
    * day, so a value that held for an hour counts 3600× one that held a
    * second — the aggregate a mean would get wrong on irregular
    * telemetry (and the standard fill for financial ticks). The last
    * sample of a day holds nothing measurable and carries zero weight;
    * single-sample days therefore have no TWAP and are excluded (the
    * honest contract — inventing a duration would be a guess).
    *
    * Determinism: durations are integer seconds; each value·dt product
    * is decimal-backed before the (order-free) decimal sum, one final
    * division rounds at 1e-4 — the sumRounded discipline applied to a
    * weighted mean. One shuffle (the user window), O(1) per row.
    */
  def eventTwap(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("day"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val samples = events
      .filter(col("ts").isNotNull && col("value").isNotNull)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"),
        to_date(col("ts")).as("day"))
      .withColumn("dt",
        unix_timestamp(lead(col("ts"), 1).over(w)) - unix_timestamp(col("ts")))
      .filter(col("dt").isNotNull) // the day's last sample holds nothing
    samples
      .groupBy(col("user_id"), col("day"))
      .agg(
        count(lit(1)).as("n_held"),
        sum(col("dt")).as("held_seconds"),
        roundFixed(
          // product in DOUBLE (one exactly-rounded IEEE op both engines),
          // then the decimal cast + exact sum — the sum_disc_price pattern
          sum((col("value") * col("dt").cast("double")).cast("decimal(38,10)"))
            .cast("double") /
            nullif(sum(col("dt")), lit(0L)).cast("double"), 4).as("twap"))
  }

  /** Sample AUTOCORRELATION of the hourly event-count series per type —
    * the periodicity detector (daily/weekly seasonality shows up as
    * spikes at the matching lag) a telemetry pipeline runs before
    * anomaly thresholds. Engineered exact: with integer hourly counts
    * c_t, n buckets and S = Σc, substitute d_t = n·c_t − S (an integer);
    * then (c_t − mean)(c_{t+k} − mean) = d_t·d_{t+k}/n², and the n²
    * cancels in r_k = Σ d_t·d_{t+k} / Σ d_t² — the WHOLE statistic is an
    * integer ratio, one final double division, no float accumulation at
    * all (the EWMA bit-determinism discipline, taken further). Products
    * stay in longs (safe while |d| < 3·10⁹ — holds through sf100-scale
    * hourly counts); the sums run decimal-backed so accumulation can
    * never overflow.
    *
    * Scale shape: the corpus-sized work is the first aggregation
    * (events → hourly counts, partial-combining, one shuffle); the
    * series itself is TIME-bounded (n = hours in range, not rows), so
    * the dense gap-fill, the lead() window and the final agg cost
    * O(types · hours) regardless of corpus size.
    */
  def eventAutocorr(events: DataFrame, maxLag: Int = 3): DataFrame = {
    require(maxLag >= 1 && maxLag <= 24, s"maxLag in [1,24], got $maxLag")
    val counts = events
      .filter(col("ts").isNotNull)
      .select(col("event_type"),
        floor(unix_timestamp(col("ts")) / lit(3600)).cast("long").as("hr"))
      .groupBy(col("event_type"), col("hr"))
      .agg(count(lit(1)).as("c"))
    val bounds = counts.groupBy(col("event_type"))
      .agg(min(col("hr")).as("lo"), max(col("hr")).as("hi"))
    // dense hour series: gap hours really are zero-count observations
    val dense = bounds
      .select(col("event_type"), explode(sequence(col("lo"), col("hi"))).as("hr"))
      .join(counts, Seq("event_type", "hr"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
    val stats = dense.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s"))
    // d = n·c − S is an exact long (|d| ≤ n·max(c) < 2^63), but the
    // PRODUCT d·d_k is not: two ~3.0e9 deviations overflow Long×Long
    // silently. Cast each factor to decimal(20,0) — wide enough for any
    // long — BEFORE multiplying, so the product is computed in decimal
    // ((20,0)×(20,0) → (38,0), exact for any pair of longs) instead of
    // wrapping (advisor finding, round 9). DuckDB's sum(BIGINT) already
    // promotes to HUGEINT, so the oracle was never in the overflow regime.
    val d = dense.join(stats, Seq("event_type"))
      .withColumn("d", (col("n") * col("c") - col("s")).cast("decimal(20,0)"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hr"))
    val led = (1 to maxLag).foldLeft(d) { (df, k) =>
      df.withColumn(s"d$k", lead(col("d"), k).over(w))
    }
    val lagAggs = (1 to maxLag).map(k =>
      sum(col("d") * col(s"d$k")).as(s"num$k"))
    led.groupBy(col("event_type"), col("n"))
      .agg(sum(col("d") * col("d")).as("den"),
        lagAggs: _*)
      .select(col("event_type") +: col("n") +:
        (1 to maxLag).map(k => roundFixed(
          col(s"num$k").cast("double") /
            nullif(col("den"), lit(0)).cast("double"), 6)
          .as(s"r$k")): _*)
  }

  /** UNPIVOT (wide → long) — the inverse of [[eventTypePivot]]'s
    * pivot and the §2.8 relational surface's last uncovered reshaping op:
    * a wide per-group metrics row melted into (group, metric, value)
    * triples, the long format every metrics store / dashboard ingests.
    * Spark plans `unpivot` as one Expand over the aggregated (tiny) wide
    * relation — the reshape itself adds ZERO shuffles on top of the
    * aggregation; at 100 TB the wide side is O(groups), so the melt is
    * free. Counts cast to double exactly (all < 2^53); the decimal-backed
    * sums keep their established rounding.
    */
  def eventMetricsLong(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).cast("double").as("n_events"),
        countDistinct(col("user_id")).cast("double").as("n_users"),
        sumRounded(col("value"), 2).as("sum_value"),
        avgRounded(col("value"), 4).as("avg_value"))
      .unpivot(
        Array(col("event_type")),
        Array(col("n_events"), col("n_users"), col("sum_value"), col("avg_value")),
        "metric", "value")

  /** Hierarchical subtotals (ROLLUP — §2.8 coverage): per (returnflag,
    * linestatus), per returnflag, and grand total in one pass. Catalyst
    * expands the grouping sets into a single Expand + hash agg — one
    * shuffle regardless of the number of levels.
    */
  def pricingRollup(lineitem: DataFrame): DataFrame =
    // rollup over the exact-decimal BASE (see [[pricingBase]]): one corpus
    // pass, Expand on ≤6 rows; level sums are decimal re-adds (exact), the
    // final round/cast is [[sumRounded]]'s own tail — values and schema
    // identical, sum_qty now order-independent per the round-16 advisor.
    pricingBase(lineitem)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("b_n")).as("n_items"),
        sum(col("b_q")).cast("double").as("sum_qty"),
        roundFixed(sum(col("b_p")).cast("double"), 2).as("sum_price")
      )

  /** OUTER join coverage (the one join class the query set lacked):
    * per-customer order counts INCLUDING customers who never ordered —
    * left join + aggregation. The join side is the fact table; Catalyst
    * still broadcasts the smaller side and the aggregate runs
    * partial+final. Zero-order customers surface with n_orders = 0 and
    * null revenue — the null-vs-zero distinction is part of the contract
    * (and of the oracle).
    */
  def customerOrderCounts(customer: DataFrame, orders: DataFrame): DataFrame =
    customer
      .join(orders, customer("c_custkey") === orders("o_custkey"), "left")
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        sumRounded(col("o_totalprice"), 2).as("revenue"))

  /** Gap-based sessionization — the canonical user-journey / training-data
    * operator: consecutive same-user events closer than `gapMinutes` belong
    * to one session. Classic two-window formulation: flag rows whose gap to
    * the previous event exceeds the threshold, running-sum the flags into a
    * session sequence number, aggregate per (user, session). ONE shuffle on
    * user_id; each partition is processed in a single sorted pass, so the
    * shape scales exactly like the as-of join. The streaming analog is
    * [[graft.streaming.StreamingEtl.sessionizedStreaming]] (native
    * session_window with mergeable state).
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > gapMinutes * 60000000L, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("new_sess")).over(run))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        (unix_micros(max(col("ts"))) - unix_micros(min(col("ts"))))
          .as("duration_us"))
  }

  /** Interval-overlap SELF-join over the sessionized stream — "which
    * sessions of different users ran concurrently" — the general
    * interval-join shape (endpoints on both sides), solved the
    * distributed way: time-GRID bucketing instead of a non-equi join.
    * Each session explodes to the grid cells its interval touches
    * (bounded by duration/cell), candidates meet in an EQUI-join on the
    * cell, the exact overlap predicate verifies, and the classic
    * first-shared-cell trick — keep a pair only in the cell
    * max(cell(a.start), cell(b.start)), which two overlapping intervals
    * provably both touch — dedups multi-cell pairs WITHOUT a distinct.
    * Candidate volume is Σ per-cell sessions², the honest interval-join
    * bound (a pathologically hot hour is a hot cell — shrink the cell
    * or pre-split it, the Skew.scala discipline); at 100 TB the cell
    * key shards the timeline, so concurrency, not history length,
    * bounds any task. Sessions compute ONCE (localCheckpoint) for both
    * join sides. The oracle brute-forces the full non-equi join. */
  def sessionOverlaps(events: DataFrame, gapMinutes: Int = 30,
                      cellMinutes: Int = 60): DataFrame = {
    val cellUs = cellMinutes * 60000000L
    val sess = sessionize(events, gapMinutes)
      .select(col("user_id"), col("session_seq"),
        col("session_start"), col("session_end"),
        unix_micros(col("session_start")).as("st_us"),
        unix_micros(col("session_end")).as("en_us"))
      .localCheckpoint(false)
    def cells(prefix: String) = sess
      .withColumn("cell", explode(sequence(
        floor(col("st_us") / cellUs).cast("long"),
        floor(col("en_us") / cellUs).cast("long"))))
      .select((sess.columns.toSeq :+ "cell").map(c =>
        col(c).as(s"$prefix$c")): _*)
    cells("a_").join(cells("b_"),
      col("a_cell") === col("b_cell") &&
        col("a_user_id") < col("b_user_id"))
      .filter(col("a_st_us") <= col("b_en_us") &&
        col("b_st_us") <= col("a_en_us"))
      .filter(col("a_cell") === greatest(
        floor(col("a_st_us") / cellUs).cast("long"),
        floor(col("b_st_us") / cellUs).cast("long")))
      .select(
        col("a_user_id").as("user_a"), col("a_session_seq").as("seq_a"),
        col("b_user_id").as("user_b"), col("b_session_seq").as("seq_b"),
        greatest(col("a_session_start"), col("b_session_start"))
          .as("overlap_start"),
        least(col("a_session_end"), col("b_session_end")).as("overlap_end"),
        (least(col("a_en_us"), col("b_en_us")) -
          greatest(col("a_st_us"), col("b_st_us"))).as("overlap_us"))
  }

  /** First-order Markov model of user behavior — the transition matrix a
    * product-analytics / simulation pipeline fits from an event log, plus
    * its stationary distribution: per user, (ts, event_id)-ordered
    * consecutive event-type pairs aggregate into transition counts, rows
    * normalize to probabilities, and `iters` power-iteration sweeps from
    * the uniform vector converge π ≈ πP. States that appear only as
    * targets get an absorbing self-loop (p = 1) so the chain is stochastic
    * over the full state set and the iteration leaks no mass.
    *
    * Shape: ONE user_id shuffle feeds the `lead` window (the [[sessionize]]
    * discipline), one hash agg to the S²-bounded count matrix — everything
    * after is state-cardinality-scale (S = distinct event types), so the
    * power iteration is metadata-bounded joins, exactly the DSIR/llr
    * bounded-state property. Determinism: probabilities quantize to 1e-6
    * once per matrix CELL, each π sweep quantizes to 1e-9 with
    * decimal-backed in-sums (the pagerank contract), and the published π
    * rounds to 1e-6.
    */
  def eventMarkov(events: DataFrame, iters: Int = 8): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val trans = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
    val counts = trans.groupBy(col("event_type").as("cur_type"), col("next_type"))
      .agg(count(lit(1)).as("n_transitions"))
    // absorbing self-loops for target-only states keep the matrix stochastic
    val absorbing = counts.select(col("next_type"))
      .except(counts.select(col("cur_type").as("next_type")))
      .select(col("next_type").as("cur_type"), col("next_type"),
        lit(0L).as("n_transitions"))
    val all = counts.unionByName(absorbing)
    val tot = all.groupBy(col("cur_type"))
      .agg(sum(col("n_transitions")).as("tot"))
    val p = all.join(tot, "cur_type")
      .select(col("cur_type"), col("next_type"), col("n_transitions"),
        when(col("tot") === 0L, lit(1.0)) // the self-loop row of an absorber
          .otherwise(roundFixed(
            col("n_transitions").cast("double") / col("tot").cast("double"), 6))
          .as("p"))
      .localCheckpoint(false)
    // the power iteration runs DRIVER-SIDE on the collected S²-row matrix
    // (S = distinct event types — metadata-scale, the collected-codebook /
    // jacobiEigen discipline): 8 distributed sweeps over a 5-row vector
    // were pure scheduling overhead (measured 2.6 s → sub-second at sf0.1,
    // identical output). Local arithmetic replays the cross-engine
    // contract op-for-op: 1e-9 grid per sweep, decimal(38,10) in-sums.
    import graft.functions.DeterministicAgg.{roundFixedLocal, wideDecimalLocal}
    def q9(x: Double) = roundFixedLocal(x, 9)
    def dec(x: Double) = wideDecimalLocal(x)
    val mat = p.select(col("cur_type"), col("next_type"), col("p")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    // an event log with no 2-event user has an EMPTY matrix: return the
    // empty relation (the oracle's behavior) instead of folding over no
    // states and crashing on the CASE builder below
    if (mat.isEmpty)
      return p.select(col("cur_type"), col("next_type"),
        col("n_transitions"), col("p"), lit(0.0).as("pi_cur"))
    val states = mat.map(_._1).distinct.sorted
    var pi = states.map(_ -> q9(1.0 / states.length)).toMap
    for (_ <- 1 to iters) {
      val sums = scala.collection.mutable.Map.empty[String, java.math.BigDecimal]
      mat.foreach { case (cur, next, pr) =>
        val m = dec(q9(pi(cur) * pr))
        sums(next) = sums.getOrElse(next, java.math.BigDecimal.ZERO).add(m)
      }
      pi = states.map(s =>
        s -> q9(sums.get(s).map(_.doubleValue()).getOrElse(0.0))).toMap
    }
    val piDf = states.map(s => (s, roundFixed(lit(pi(s)), 6)))
      .foldLeft(Option.empty[Column]) { case (acc, (s, v)) =>
        Some(acc.fold(when(col("cur_type") === lit(s), v))(
          _.when(col("cur_type") === lit(s), v)))
      }
    p.select(col("cur_type"), col("next_type"), col("n_transitions"),
      col("p"), piDf.get.as("pi_cur"))
  }

  /** SCD Type-2 dimension build from a change log — the warehouse operator
    * that turns an event stream into validity intervals: per user, ordered
    * by (ts, event_id), consecutive runs of the same `event_type` collapse
    * into one row with [valid_from, valid_to) bounds; `valid_to` is the
    * next run's start (NULL on the user's current row). The canonical
    * "dimension table from a CDC feed" pass.
    *
    * Shape: ONE shuffle (hash partition by user_id) feeding the run-length
    * window, the run-keyed agg, and the `lead` window — all three reuse
    * the same partitioning, so Exchange appears once. At 100 TB this is
    * the plan you want: the change log is re-sorted per user anyway, and
    * segment collapse is map-side within the sorted partition.
    */
  def scd2UserState(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val segs = events
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("chg",
        when(lag(col("event_type"), 1).over(w).isNull ||
          lag(col("event_type"), 1).over(w) =!= col("event_type"), 1L)
          .otherwise(0L))
      .withColumn("seg", sum(col("chg")).over(run))
      .groupBy(col("user_id"), col("seg"))
      .agg(
        // event_type is constant within a run; min() keeps the agg
        // deterministic without a first()-ordering dependency
        min(col("event_type")).as("event_type"),
        min(col("ts")).as("valid_from"),
        count(lit(1)).as("n_events"))
    val ws = Window.partitionBy(col("user_id")).orderBy(col("seg").asc)
    segs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(ws))
      .select(col("user_id"), col("event_type"), col("valid_from"),
        col("valid_to"), col("n_events"),
        col("valid_to").isNull.as("is_current"))
  }

  /** POINT-IN-TIME lookup against the [[scd2UserState]] dimension — the
    * classic versioned-dimension join every warehouse needs: each purchase
    * is enriched with the state its user was in ONE HOUR BEFORE the
    * purchase (the offset is what makes the lookup non-trivial: the run
    * containing the purchase itself is by construction a 'purchase' run).
    *
    * Implemented as the NATIVE as-of join ([[graft.plans.AsOf.backward]])
    * against `valid_from`: SCD2 runs chain contiguously per user with the
    * last interval open-ended, so "latest interval starting at-or-before
    * t" IS interval containment — no BETWEEN theta join, no interval
    * explode; the as-of exec's O(1)-state merge (or broadcast probe) does
    * the whole lookup. Purchases earlier than the user's first state (or
    * whose probe time precedes it) null-extend, matching the LEFT JOIN
    * oracle. Also composition evidence: the custom operator consumes a
    * DERIVED relation (window + agg output), not just scans.
    */
  def purchaseStateBefore(events: DataFrame, offsetHours: Int = 1): DataFrame = {
    val dim = scd2UserState(events).select(
      col("user_id").as("d_user"), col("event_type").as("state_type"),
      col("valid_from").as("state_since"))
    val facts = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"),
        (col("ts") - expr(s"INTERVAL $offsetHours HOURS")).as("probe_ts"))
    graft.plans.AsOf.backward(facts, dim,
        "user_id", "d_user", "probe_ts", "state_since")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("state_type"), col("state_since"))
  }

  /** Full CUBE with grouping ids (§2.8 breadth next to [[pricingRollup]]):
    * all four grouping sets in one Expand + single hash aggregation; the
    * grouping id disambiguates subtotal NULLs from data NULLs.
    */
  def pricingCube(lineitem: DataFrame): DataFrame =
    // cube over the exact-decimal BASE — the [[pricingRollup]] reshape;
    // the Expand multiplies ≤6 base rows by 4 grouping sets instead of
    // the whole fact table (see [[pricingBase]]).
    pricingBase(lineitem)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping_id().cast("long").as("gid"),
        sum(col("b_n")).as("n_items"),
        sum(col("b_q")).cast("double").as("sum_qty"),
        roundFixed(sum(col("b_p")).cast("double"), 2).as("sum_price")
      )

  /** Sketch-based distinct counting (approx_count_distinct = HyperLogLog++):
    * O(1) state per group instead of a distinct-shuffle — the 100 TB way to
    * count uniques. Not oracle-comparable (the builtin's HLL++ register
    * layout is Spark-internal); RelationalSpec bounds its error against the
    * exact count instead — [[eventTypeHllUsers]] rebuilds the same
    * algorithm declaratively from the portable hash and IS hash-oracled.
    */
  def eventTypeApproxUsers(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id")).as("approx_users"),
        count(lit(1)).as("n_events")
      )

  /** Count–Min frequency sketch per group (Spark's own
    * `count_min_sketch` aggregate — mergeable O(w·d) buffers): point
    * frequency estimates for ANY key from bounded state, the streaming/
    * scale complement to exact GROUP BY counting and the probabilistic
    * sibling of the exact Misra-Gries heavy-hitter path
    * ([[heavyUsers]] — and, like HLL, the builtin CMS binary layout is
    * engine-defined and cannot hash-oracle; the from-scratch rebuild
    * [[countMinCounts]] is the driver-oracled representative, round 11).
    * The returned sketch column deserializes with
    * `org.apache.spark.util.sketch.CountMinSketch.readFrom`;
    * RelationalSpec bounds its estimates instead: CMS never
    * under-counts, and over-counts by at most eps·N with confidence
    * 1−delta.
    */
  def eventTypeCmsUsers(events: DataFrame, eps: Double = 0.001,
                        confidence: Double = 0.99): DataFrame =
    events
      .groupBy(col("event_type"))
      .agg(
        count_min_sketch(col("user_id"), lit(eps), lit(confidence),
          lit(42)).as("cms"),
        count(lit(1)).as("n_events"))

  /** Approximate distinct users per event type via a K-MINIMUM-VALUES
    * sketch — a distributed cardinality sketch that, unlike the BUILTIN
    * HLL (whose register layout is engine-defined; see
    * [[eventTypeHllUsers]] for the from-scratch oracled rebuild), is
    * directly DETERMINISTIC and hash-oracled:
    * keep the `k` smallest distinct portable hashes per group; if fewer
    * than `k` exist the count is exact, else estimate
    * (k−1) / (kth_min / 2^60) — every step (sha-prefix hash, distinct,
    * integer order, one double division) is reproducible bit-for-bit in
    * DuckDB. NULL user_ids are filtered before hashing (cardinality of the
    * non-null values, like approx_count_distinct) — also a determinism
    * requirement: Spark sorts NULL first, DuckDB last, so a surviving NULL
    * hash would shift the k-th minimum between engines.
    *
    * This ORACLE-SHAPED form ranks via a window, whose per-group state is
    * O(distinct), NOT O(k) — fine for the gate, not the 100 TB shape. The
    * production form is [[eventTypeKmvUsersBounded]] ([[graft.functions.KmvSketch]],
    * O(k) buffers at every stage, merge = union + re-truncate), asserted
    * result-identical in RelationalSpec; this query stays the driver entry
    * so the oracle remains a plain SQL replica.
    */
  def eventTypeKmvUsers(events: DataFrame, k: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hashed = events
      .filter(col("user_id").isNotNull)
      .select(col("event_type"),
        graft.operators.TextOps.portableHash64(col("user_id").cast("string")).as("h"))
      .distinct()
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
    hashed
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_seen"), max(col("h")).as("kth"))
      .select(col("event_type"),
        graft.functions.DeterministicAgg.roundFixed(
          when(col("n_seen") < k, col("n_seen").cast("double"))
            .otherwise(lit((k - 1).toDouble) /
              (col("kth").cast("double") / lit(math.pow(2.0, 60)))), 4)
          .as("approx_users"))
  }

  /** The PRODUCTION form of [[eventTypeKmvUsers]]: the same KMV sketch as a
    * bounded [[graft.functions.KmvSketch]] Aggregator — O(k) aggregation
    * state at every stage (map-side partials included), one partial+final
    * hash agg, no window sort over the distinct values. Identical results
    * to the window form by construction (same distinct-hash set → same
    * k-th minimum → same division), asserted in RelationalSpec; the window
    * form stays the driver query because its oracle is a plain SQL replica.
    */
  def eventTypeKmvUsersBounded(events: DataFrame, k: Int = 64): DataFrame = {
    val kmv = udaf(new graft.functions.KmvSketch(k),
      org.apache.spark.sql.Encoders.scalaLong)
    events
      .filter(col("user_id").isNotNull)
      .select(col("event_type"),
        graft.operators.TextOps.portableHash64(col("user_id").cast("string")).as("h"))
      .groupBy(col("event_type"))
      .agg(graft.functions.DeterministicAgg.roundFixed(kmv(col("h")), 4)
        .as("approx_users"))
  }

  /** HLL SKETCH ALGEBRA — the property that makes sketches matter at
    * 100 TB: per-group registers MERGE by register-wise max (max is
    * associative/commutative/idempotent), so pre-aggregated per-type
    * sketch tiles roll up to the global distinct count WITHOUT touching
    * raw data again — the KMV-overlap story ([[kmvOverlap]]'s family) on
    * the HLL side. Emits one row per event_type (its own estimate) plus
    * an `__all__` row whose registers are the max-merge of the per-type
    * registers; union-of-sketches ≡ sketch-of-union is exact by
    * construction (same hash → same register/rho), asserted in spec.
    * Every step integer-exact until the mirrored final expression, like
    * [[eventTypeHllUsers]].
    */
  def eventTypeHllRollup(events: DataFrame, p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 14, s"precision p must be in [4, 14], got $p")
    val m = 1 << p
    val w = 60 - p
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val tail = shiftright(col("h"), p)
    val perType = events
      .filter(col("user_id").isNotNull)
      .select(col("event_type"),
        graft.operators.TextOps.portableHash64(col("user_id").cast("string")).as("h"))
      .select(col("event_type"),
        pmod(col("h"), lit(m.toLong)).as("reg"),
        when(tail === 0L, lit(w + 1))
          .otherwise(lit(w + 1) - length(bin(tail))).as("rho"))
      .groupBy(col("event_type"), col("reg"))
      .agg(max(col("rho")).as("r"))
    // the merge: per-type registers union'd by register-wise max — the
    // raw rows are NEVER re-read for the rollup
    val merged = perType
      .groupBy(col("reg"))
      .agg(max(col("r")).as("r"))
      .select(lit("__all__").as("event_type"), col("reg"), col("r"))
    perType.unionByName(merged)
      .groupBy(col("event_type"))
      .agg(
        sum(expr(s"shiftleft(cast(1 as bigint), ${w + 1} - r)")).as("s_present"),
        count(lit(1)).as("n_reg"))
      .select(col("event_type"),
        (lit(m.toLong) - col("n_reg")).as("v_empty"),
        (lit(alpha) * lit(m.toDouble * m.toDouble) * lit(math.pow(2.0, w + 1)) /
          (col("s_present") +
            (lit(m.toLong) - col("n_reg")) * lit(1L << (w + 1))).cast("double"))
          .as("raw"))
      .select(col("event_type"),
        roundFixed(
          when(col("raw") <= lit(2.5 * m) && col("v_empty") > 0,
            lit(m.toDouble) * log(lit(m.toDouble) / col("v_empty").cast("double")))
            .otherwise(col("raw")), 4).as("hll_users"),
        col("v_empty"))
  }

  /** From-scratch HYPERLOGLOG distinct count, fully hash-oracled — the
    * sketch the builtin `approx_count_distinct` wraps, rebuilt declaratively
    * so every step is engine-portable (the builtin's HLL++ register LAYOUT
    * is Spark-internal and cannot be replayed in DuckDB; the ALGORITHM is
    * public and replays fine). Split the portable 60-bit hash into a
    * register index (low `p` bits) and a tail of `w = 60 − p` bits; the
    * register value is the tail's leading-zero count + 1, computed exactly
    * as `(w + 1) − bitlen(tail)` with `bin()` (identical minimal-binary
    * semantics on both engines — no float log2 near power-of-two edges).
    * Per (group, register) keep `max(rho)` — max is idempotent, so unlike
    * KMV no distinct pass is needed and duplicate arrivals are free. The
    * indicator sum Z = Σ 2^−M_j is kept as an EXACT integer in units of
    * 2^−(w+1) (`shiftleft`, ≤ 2^61 for p = 8 — no float-add rounding that
    * would vary with Spark's partition merge order); only the final
    * estimate `α·m²·2^(w+1) / S` and the standard small-range linear-
    * counting branch (`m·ln(m/V)` when E ≤ 2.5m and empty registers exist)
    * touch doubles, with literals and parenthesization mirrored token-for-
    * token in the oracle SQL. The large-range correction is unnecessary: it
    * starts at 2^60/30 distincts, beyond any input that fits the hash.
    *
    * Scale shape: two hash aggregations, both map-side-combining — stage 1
    * state is capped at m registers per group per partition (m = 256 for
    * p = 8), stage 2 input at m rows per group. O(m) state per group at
    * every stage, versus count(distinct)'s O(n) shuffle of the raw keys —
    * THE 100 TB distinct-count shape. Error ≈ 1.04/√m (~6.5% at p = 8).
    */
  def eventTypeHllUsers(events: DataFrame, p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 14, s"precision p must be in [4, 14], got $p")
    hllEstimateTail(hllRegisters(events, p), p)
  }

  /** The per-(group, register) max-rho table — [[eventTypeHllUsers]]'s
    * stage 1, exposed so the STREAMING maintenance path
    * ([[graft.streaming.StreamingSnapshots.hllStreamUsers]]) can build
    * the identical table incrementally: register maxima are idempotent
    * mergeable state (max is associative, commutative, idempotent — the
    * covariance-moments argument with an even stronger algebra), so an
    * update-mode streaming aggregate over this same projection converges
    * to the batch register table exactly. */
  private[graft] def hllRegisters(events: DataFrame, p: Int): DataFrame = {
    val m = 1 << p           // register count
    val w = 60 - p           // tail bits of the portable 60-bit hash
    val tail = shiftright(col("h"), p)
    events
      .filter(col("user_id").isNotNull)
      .select(col("event_type"),
        graft.operators.TextOps.portableHash64(col("user_id").cast("string")).as("h"))
      .select(col("event_type"),
        pmod(col("h"), lit(m.toLong)).as("reg"),
        when(tail === 0L, lit(w + 1))
          .otherwise(lit(w + 1) - length(bin(tail))).as("rho"))
      .groupBy(col("event_type"), col("reg"))
      .agg(max(col("rho")).as("r"))
  }

  /** The estimate tail over an already-built register table (the
    * [[countMinEstimates]] split: the streaming twin feeds its maintained
    * registers through the identical expressions, so the batch oracle
    * hashes the streamed sketch verbatim). */
  private[graft] def hllEstimateTail(registers: DataFrame, p: Int): DataFrame = {
    val m = 1 << p
    val w = 60 - p
    val alpha = 0.7213 / (1.0 + 1.079 / m) // standard alpha_m for m >= 128
    registers
      .groupBy(col("event_type"))
      .agg(
        sum(expr(s"shiftleft(cast(1 as bigint), ${w + 1} - r)")).as("s_present"),
        count(lit(1)).as("n_reg"))
      .select(col("event_type"),
        (lit(m.toLong) - col("n_reg")).as("v_empty"),
        (lit(alpha) * lit(m.toDouble * m.toDouble) * lit(math.pow(2.0, w + 1)) /
          (col("s_present") +
            (lit(m.toLong) - col("n_reg")) * lit(1L << (w + 1))).cast("double"))
          .as("raw"))
      .select(col("event_type"),
        roundFixed(
          when(col("raw") <= lit(2.5 * m) && col("v_empty") > 0,
            lit(m.toDouble) * log(lit(m.toDouble) / col("v_empty").cast("double")))
            .otherwise(col("raw")), 4).as("hll_users"),
        col("v_empty"))
  }

  /** Exact interpolated percentiles (percentile_cont semantics) per group
    * WITHOUT collecting values into an aggregation buffer: rank each row in
    * its group, compute the fractional target rank from the group size, and
    * pick the two bracketing values with conditional aggregates. One
    * shuffle + one sorted window pass per group — the group's values never
    * sit in one buffer, so a billion-row group costs the same per-row work
    * as a hundred-row group (Spark's builtin `percentile` buffers the
    * group's values; this shape is the 100 TB-safe form). Interpolation is
    * the same three IEEE ops on both engines, so the oracle matches
    * bit-for-bit.
    */
  def valuePercentiles(events: DataFrame, ps: Seq[Double] = Seq(0.5, 0.9)): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value").asc, col("event_id").asc)
    val grp = Window.partitionBy(col("event_type"))
    // drop null values BEFORE ranking (percentile_cont semantics); also
    // Spark orders nulls first while DuckDB orders them last — excluding
    // them keeps the rank space engine-identical
    val ranked = events.select(col("event_type"), col("value"), col("event_id"))
      .filter(col("value").isNotNull)
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(grp))
    val aggs = ps.zipWithIndex.flatMap { case (p, i) =>
      val idx = (col("n") - 1) * lit(p)
      val lo = floor(idx) + 1
      Seq(
        max(when(col("rn") === lo, col("value"))).as(s"vlo$i"),
        max(when(col("rn") === lo + 1, col("value"))).as(s"vhi$i"),
        max(when(col("rn") === lo, idx - floor(idx))).as(s"frac$i"))
    }
    ranked.groupBy(col("event_type"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("event_type") +: ps.zipWithIndex.map { case (p, i) =>
        roundFixed(
          col(s"vlo$i") + col(s"frac$i") *
            (coalesce(col(s"vhi$i"), col(s"vlo$i")) - col(s"vlo$i")), 6)
          .as(s"p${(p * 100).toInt}")
      }: _*)
  }

  /** APPROXIMATE per-group quantiles from a mergeable equi-width histogram
    * sketch — the 100 TB complement of [[valuePercentiles]]: the exact form
    * pays one sorted window pass over every row per group; this pays a
    * B-bucket histogram (one partial+final hash agg whose post-shuffle
    * cardinality is ≤ groups·B — metadata-scale) and answers any p from
    * the same sketch: the picked bucket provably contains the discrete
    * type-1 quantile (the value at rank ceil(p·n)), so the reported upper
    * boundary brackets it within one bucket width (spec-asserted). The
    * per-group [lo, hi]
    * calibration is its own tiny agg (groups-cardinality rows, broadcast
    * back); at a real deployment the bounds come free from column stats.
    *
    * Determinism: the bucket index `least(B-1, floor((v-lo)/width))` and
    * the reported upper boundary `lo + (q+1)·width` are the same IEEE
    * doubles on both engines, and the cumulative pick reuses
    * [[TextOps.histQuantiles]] — the one shared quantile implementation.
    * Estimates round at 1e-6 like every published double.
    */
  def valueHistQuantiles(events: DataFrame, buckets: Int = 256,
                         ps: Seq[Double] = Seq(0.5, 0.9)): DataFrame = {
    val vals = events.select(col("event_type"), col("value"))
      .filter(col("value").isNotNull)
    val bounds = vals.groupBy(col("event_type")).agg(
      min(col("value")).as("lo"), max(col("value")).as("hi"))
    val width = (col("hi") - col("lo")) / lit(buckets.toDouble)
    val bucketed = vals
      .join(broadcast(bounds), Seq("event_type"))
      .select(col("event_type"), col("lo"), col("hi"),
        when(col("hi") === col("lo"), lit(0L))
          .otherwise(least(lit(buckets - 1).cast("long"),
            floor((col("value") - col("lo")) / width).cast("long")))
          .as("bucket"))
    val picked = graft.operators.TextOps.histQuantiles(
      bucketed.select(col("event_type"), col("bucket")),
      "event_type", "bucket", ps)
    picked
      .join(broadcast(bounds), Seq("event_type"))
      .select(col("event_type"), col("p"),
        roundFixed(
          col("lo") + (col("q") + lit(1L)).cast("double") *
            ((col("hi") - col("lo")) / lit(buckets.toDouble)), 6)
          .as("q_upper"))
  }

  /** Set operation coverage (§2.8: absent in the reference, free in Spark):
    * users seen in purchases but never in errors. Semantically an EXCEPT over
    * two distincts, but planned as ONE hash aggregation over user_id with
    * conditional-presence flags — a single shuffle with map-side partials,
    * instead of the distinct+distinct+except chain's three (round-1 verdict
    * "what's wrong" #5). At 100 TB the map-side partial collapses each
    * partition to ≤ |users| rows before anything moves.
    */
  def purchasersWithoutErrors(events: DataFrame): DataFrame =
    events
      .filter(col("event_type").isin("purchase", "error"))
      .groupBy(col("user_id"))
      .agg(
        max(when(col("event_type") === "purchase", 1).otherwise(0)).as("has_purchase"),
        max(when(col("event_type") === "error", 1).otherwise(0)).as("has_error")
      )
      .filter(col("has_purchase") === 1 && col("has_error") === 0)
      .select(col("user_id"))
      .orderBy(col("user_id"))

  /** Deterministic skew fixture for [[heavyUsers]]: the test corpus is
    * frequency-uniform (~66 events per user at every sf), so a heavy-hitter
    * query over it is vacuous at any honest threshold. This plants real
    * skew the same way [[graft.operators.Similarity.plantNearDups]] plants
    * near-dups: users with `user_id % mod == rem` get their events
    * replicated `factor`× (a literal-array explode — pure narrow work), so
    * exactly those users cross a 1% frequency threshold and everyone else
    * stays an order of magnitude below it. Content-stable: the planted set
    * is a function of ids only.
    */
  def plantHeavyUsers(events: DataFrame, factor: Int = 20, mod: Int = 500,
                      rem: Int = 7): DataFrame = {
    val extra = events
      .filter(pmod(col("user_id"), lit(mod.toLong)) === rem.toLong)
      .withColumn("rep", explode(lit((1 until factor).toArray)))
      .drop("rep")
    events.unionByName(extra)
  }

  /** EXACT heavy hitters (users with ≥ `minFrac` of all events) at bounded
    * state — the two-pass sketch-then-verify design:
    *
    * Pass 1 finds CANDIDATES with a [[graft.functions.MisraGries]] sketch:
    * one partial+final hash agg whose buffer is ≤ k−1 entries at every
    * stage. MG guarantees every item with true count > N/k survives; with
    * k chosen so 1/k < minFrac, the candidate set is a SUPERSET of the
    * true heavy hitters regardless of partitioning or merge order.
    *
    * Pass 2 makes the answer exact and deterministic: re-count ONLY the
    * candidates (a broadcast semi join — the candidate list is ≤ k−1 ids,
    * metadata scale) and apply the real threshold to the exact counts.
    * Sketch noise (under-estimates, partitioning-dependent survivors below
    * the bound) is filtered out here, so the output equals the plain
    * GROUP BY / HAVING the oracle runs — at a fraction of its shuffle: the
    * full-cardinality count shuffles every key once; this shape shuffles
    * O(k) keys after the bounded sketch agg.
    *
    * The threshold is `ceil(N · minFrac)` evaluated in IEEE double —
    * the oracle computes the identical expression, so no boundary case can
    * disagree.
    */
  /** COUNT-MIN sketch (Cormode & Muthukrishnan 2005), built FROM SCRATCH
    * so it hash-oracles — the driver-checked rebuild of
    * [[eventTypeCmsUsers]] (whose builtin `count_min_sketch` buffer is
    * engine-defined binary, like HLL's registers; this is the same
    * demote-builtin/oracle-the-rebuild move as eventTypeHllUsers):
    * [[heavyUsers]]' Misra–Gries answers "which keys are frequent", KMV
    * answers "how many distinct", Count-Min answers "about how often is
    * THIS key" in d·w counters whatever the key cardinality — the sketch
    * a 100 TB pipeline probes when exact per-key counts don't fit
    * anywhere. Each of `depth` rows
    * hashes every event's user_id into one of `width` cells
    * (h_r = portable sha hash of "cm:r:key" mod width — deterministic
    * and engine-replayable, like every hash the oracles replay); the
    * estimate for a key is the MIN over its d cells — an upper bound on
    * the true count, within ε·N with probability 1−δ for w = ⌈e/ε⌉,
    * d = ⌈ln 1/δ⌉.
    *
    * Scale shape: the build explodes each row ×depth BEFORE the
    * aggregate, but map-side partial aggregation collapses the shuffle
    * to ≤ depth·width rows per task — the grid, not the corpus, moves.
    * The probe side joins the (depth·width)-row grid BROADCAST, and the
    * exact comparison counts push the probe-set In-filter to the scan
    * (the [[heavyUsers]] verify discipline). Output per probe key:
    * (user_id, est_count, exact_count) with est ≥ exact always. */
  def countMinCounts(events: DataFrame, depth: Int = 4, width: Int = 256,
                     probeLo: Long = 0L, probeHi: Long = 19L): DataFrame =
    countMinEstimates(events, countMinGrid(events, depth, width),
      depth, width, probeLo, probeHi)

  /** The CM hash: row r's cell for `key` on a `width`-cell row. */
  private[graft] def cmCell(r: Column, key: Column, width: Int): Column =
    pmod(graft.operators.TextOps.portableHash64(
      concat(lit("cm:"), r.cast("string"), lit(":"), key.cast("string"))),
      lit(width.toLong))

  /** The d×w counter grid — (r, c, cnt), ≤ depth·width rows. Exposed so
    * the STREAMING maintenance path ([[graft.streaming.StreamingSnapshots]])
    * can build the identical grid incrementally: per-cell counts are
    * classic mergeable state, the covariance-moments argument. */
  private[graft] def countMinGrid(events: DataFrame, depth: Int,
                                  width: Int): DataFrame =
    events
      .select(explode(sequence(lit(0), lit(depth - 1))).as("r"),
        col("user_id"))
      .select(col("r"), cmCell(col("r"), col("user_id"), width).as("c"))
      .groupBy(col("r"), col("c")).agg(count(lit(1)).as("cnt"))

  /** The probe/verify tail over an already-built grid: min-over-rows
    * estimates for the fixed probe range + exact comparison counts. */
  private[graft] def countMinEstimates(events: DataFrame, grid: DataFrame,
                                       depth: Int, width: Int,
                                       probeLo: Long,
                                       probeHi: Long): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val probes = (probeLo to probeHi).toDF("user_id")
    val est = probes
      .select(col("user_id"),
        explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .select(col("user_id"), col("r"),
        cmCell(col("r"), col("user_id"), width).as("c"))
      .join(broadcast(grid), Seq("r", "c"), "left_outer")
      .groupBy(col("user_id"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_count"))
    val exact = events
      .filter(col("user_id").between(probeLo, probeHi))
      .groupBy(col("user_id")).agg(count(lit(1)).as("exact_count"))
    est.join(exact, Seq("user_id"), "left_outer")
      .select(col("user_id"), col("est_count"),
        coalesce(col("exact_count"), lit(0L)).as("exact_count"))
  }

  def heavyUsers(events: DataFrame, k: Int = 200,
                 minFrac: Double = 0.01): DataFrame = {
    require(1.0 / k < minFrac,
      s"k=$k too small for minFrac=$minFrac: need 1/k < minFrac for the " +
        "Misra-Gries superset guarantee")
    val mg = udaf(new graft.functions.MisraGries(k),
      org.apache.spark.sql.Encoders.scalaLong)
    // ONE pass produces both the candidate sketch and N (r5 advice: the
    // separate count() was a full extra scan). Collecting here is ≤ k−1
    // ids + one long — metadata scale; the candidates then reach pass 2 as
    // an In-list literal, so the verify pass is a single scan with the
    // candidate filter evaluated at (or pushed into) the parquet scan, no
    // join at all.
    val sketch = events
      .agg(mg(col("user_id")).as("cand"), count(lit(1)).as("n")).first()
    val candidates = sketch.getAs[scala.collection.Seq[Long]]("cand").toSeq
    val threshold = math.ceil(sketch.getAs[Long]("n") * minFrac).toLong
    events
      .filter(col("user_id").isin(candidates: _*))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .filter(col("n_events") >= threshold)
  }

  /** PIVOT (§2.8 relational completeness): per-user event counts spread
    * across one column per event type. The value list is DECLARED, not
    * discovered — `pivot(col, values)` with explicit values skips the
    * eager collect-distinct job Spark otherwise runs at plan-build time
    * (at 100 TB that job is a full scan before the query even starts),
    * and Catalyst compiles the pivot to a single partial+final hash agg
    * of `count(CASE WHEN ...)` columns — one shuffle of (user, 5 longs)
    * rows, identical to the hand-written conditional aggregation the
    * oracle runs. Empty cells surface as 0, not null (count semantics).
    */
  def eventTypePivot(events: DataFrame,
                     types: Seq[String] = Seq("click", "error", "purchase",
                       "signup", "view")): DataFrame = {
    val p = events.groupBy(col("user_id"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
    p.select(col("user_id") +:
      types.map(t => coalesce(col(s"`$t`"), lit(0L)).as(s"n_$t")): _*)
  }

  /** Time-series gap fill (resample): per-user DAILY event counts with
    * explicit zero rows for every day inside the user's own active span —
    * the dense-calendar shape a downstream forecaster needs. The span is
    * one user-keyed agg; each user's day list comes from a `sequence`
    * explode BOUNDED by their span (a generator over metadata, never a
    * calendar cross join against the user dimension); the fill join is
    * co-keyed on (user, day) with the daily agg, so at scale both sides
    * hash-partition the same way. Nothing here scans more than the events
    * table twice (daily agg + span agg share the same scan shape;
    * Catalyst prunes to the two needed columns).
    */
  def userDailyGapfill(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))
    val span = daily.groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    span
      .select(col("user_id"), explode(sequence(col("d0"), col("d1"))).as("day"))
      .join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
  }

  /** Ordered funnel analysis: for every user who ever viewed, the earliest
    * view → the earliest click strictly after it → the earliest purchase
    * strictly after that — the classic conversion funnel where each stage
    * must RESPECT the previous stage's timestamp (a plain per-type min
    * would count a purchase that preceded the first view). Three
    * user-keyed min-aggs chained by user-keyed joins — every join and agg
    * shares the same hash partitioning, so at scale the chain is one
    * shuffle of each filtered stage, no windows, no self theta joins.
    * Stage timestamps are null (and `converted` false) when the funnel
    * stalls.
    */
  def funnelStages(events: DataFrame): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
    val clicks = events.filter(col("event_type") === "click")
      .join(views, Seq("user_id"))
      .filter(col("ts") > col("t_view"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
    val purchases = events.filter(col("event_type") === "purchase")
      .join(clicks, Seq("user_id"))
      .filter(col("ts") > col("t_click"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
    views
      .join(clicks, Seq("user_id"), "left")
      .join(purchases, Seq("user_id"), "left")
      .select(col("user_id"), col("t_view"), col("t_click"),
        col("t_purchase"), col("t_purchase").isNotNull.as("converted"))
  }

  /** Data-quality / constraint report (the Deequ-style pipeline gate): ONE
    * pass over the table computes, per declared column, the profile a
    * quality gate checks — row count, null count, approximate-free exact
    * distinct count, min/max — plus rule-violation counts (here: events
    * must have non-null ts, non-negative user_id, a known event_type, and
    * value within [0, 1000)). Everything is conditional aggregation inside
    * one partial+final hash agg — a quality gate over 100 TB costs exactly
    * one scan, no per-rule passes. Distinct counts are the one
    * shuffle-bearing term (count_distinct plans an Expand); they share the
    * same single aggregation. The output is one row per profiled column
    * (UNION of per-column 1-row aggs over the same cached scan shape —
    * Catalyst collapses each branch to the pruned column set).
    */
  def dataQualityReport(events: DataFrame): DataFrame = {
    val knownTypes = Seq("click", "error", "purchase", "signup", "view")
    def profile(c: String, violation: Column): DataFrame =
      events.agg(
        count(lit(1)).as("n_rows"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
        countDistinct(col(c)).as("n_distinct"),
        min(col(c)).cast("string").as("min_str"),
        max(col(c)).cast("string").as("max_str"),
        sum(when(violation, 1L).otherwise(0L)).as("n_violations"))
        .select(lit(c).as("column"), col("n_rows"), col("n_null"),
          col("n_distinct"), col("min_str"), col("max_str"),
          col("n_violations"))
    profile("ts", col("ts").isNull)
      .unionByName(profile("user_id",
        col("user_id").isNull || col("user_id") < 0L))
      .unionByName(profile("event_type",
        col("event_type").isNull || !col("event_type").isin(knownTypes: _*)))
      .unionByName(profile("value",
        col("value").isNotNull && (col("value") < 0.0 || col("value") >= 1000.0)))
  }

  /** KMV sketch ALGEBRA — the property that makes distinct-count sketches
    * a 100 TB tool: two per-type KMV user sketches (each O(k) state,
    * mergeable) COMBINE into union and intersection cardinality estimates
    * without ever re-touching the raw data. Union: the k smallest distinct
    * hashes across both sketches estimate |A ∪ B| exactly as a directly-
    * built union sketch would (k-min of a union = k-min of the sketch
    * union — the merge IS lossless for the top-k). Intersection: the
    * fraction ρ of the union sketch's hashes present in BOTH input
    * sketches is an unbiased Jaccard estimate, and |A ∩ B| ≈ ρ·|A ∪ B|
    * (the standard KMV set-operation estimator). Everything downstream of
    * the two bounded sketches is metadata-scale: the union top-k is a
    * TakeOrdered over ≤2k rows (never an unpartitioned rank window), the
    * estimate one 1-row agg. Deterministic end-to-end — same portable
    * hash, integer order, one double division — so the oracle replays it
    * exactly.
    */
  def kmvUserOverlap(events: DataFrame, typeA: String = "view",
                     typeB: String = "purchase", k: Int = 64): DataFrame = {
    val hashed = events
      .filter(col("user_id").isNotNull &&
        col("event_type").isin(typeA, typeB))
      .select(col("event_type"),
        graft.operators.TextOps.portableHash64(col("user_id").cast("string"))
          .as("h"))
      .distinct()
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
    val sk = hashed.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
    val uni = sk.groupBy(col("h")).agg(
      max(when(col("event_type") === typeA, 1).otherwise(0)).as("in_a"),
      max(when(col("event_type") === typeB, 1).otherwise(0)).as("in_b"))
    val topk = uni.orderBy(col("h").asc).limit(k)
    val agg = topk.agg(
      count(lit(1)).as("n_seen"), max(col("h")).as("kth"),
      sum(when(col("in_a") === 1 && col("in_b") === 1, 1L).otherwise(0L))
        .as("n_both"))
    val estU = when(col("n_seen") < k, col("n_seen").cast("double"))
      .otherwise(lit((k - 1).toDouble) /
        (col("kth").cast("double") / lit(math.pow(2.0, 60))))
    agg.select(col("n_seen"), col("n_both"),
      roundFixed(estU, 4).as("est_union"),
      roundFixed((col("n_both").cast("double") / col("n_seen").cast("double"))
        * estU, 4).as("est_intersection"))
  }

  /** Deterministic "update batch" fixture for [[mergeUpsert]]: one slice
    * of events re-keyed verbatim with a bumped value (rows the merge must
    * OVERWRITE) and one slice under fresh collision-free ids (rows it must
    * INSERT) — the [[TextOps.plantIngestBatch]] convention on the events
    * table. */
  def plantEventUpdates(events: DataFrame): DataFrame = {
    val maxId = Option(events.agg(max(col("event_id"))).first().get(0))
    require(maxId.nonEmpty, "plantEventUpdates: events must be non-empty")
    val offset = maxId.get.asInstanceOf[Long] + 1L
    val base = events.select(col("event_id"), col("ts"), col("user_id"),
      col("event_type"), col("value"))
    base.filter(pmod(col("event_id"), lit(10)) === 0)
      .withColumn("value", col("value") + lit(100.0))
      .unionByName(base.filter(pmod(col("event_id"), lit(17)) === 3)
        .withColumn("event_id", col("event_id") + offset))
  }

  /** MERGE / upsert (SCD-1): apply an update batch to a target table —
    * matching keys take the update's row, unmatched target rows survive,
    * unmatched update rows insert. One FULL OUTER key join with
    * column-wise coalesce (update side wins) — the batch formulation of
    * `MERGE INTO`. At 100 TB both sides hash-partition on the key (or the
    * update batch broadcasts when small, as AQE chooses here); with the
    * target stored bucketed by key the merge rewrites only the buckets
    * the batch touches. Update keys must be unique (they are a keyed
    * batch); target keys are unique by construction.
    */
  def mergeUpsert(target: DataFrame, updates: DataFrame,
                  key: String = "event_id"): DataFrame = {
    val t = target.select(target.columns.map(c =>
      col(c).as(if (c == key) c else s"t_$c")): _*)
    // row-presence marker, NOT per-column coalesce: a matched update row
    // wins wholesale even where its columns are legitimately NULL
    val u = updates.select(updates.columns.map(c =>
      col(c).as(if (c == key) c else s"u_$c")): _*)
      .withColumn("u_present", lit(true))
    val cols = target.columns.filterNot(_ == key)
    t.join(u, Seq(key), "full_outer")
      .select(col(key) +: cols.map(c =>
        when(col("u_present"), col(s"u_$c")).otherwise(col(s"t_$c"))
          .as(c)): _*)
  }

  /** Point-in-interval RANGE join as a binned EQUI-join — the general
    * range join the engine otherwise lacks (eventsInPrecedingHour covers
    * only the keyed self-join case; this one has NO equality key at all).
    * The interval fixture is derived deterministically from the fact table
    * itself: every `error` event of every `userMod`-th user opens a
    * `windowMinutes` incident window, and the query aggregates ALL events
    * (any user) falling in each window — what a naive engine plans as an
    * O(|events|·|intervals|) theta join / CartesianProduct.
    *
    * The bin trick makes it an equi-join: time is cut into fixed bins of
    * exactly the window length, an interval explodes to the ≤2 bins it
    * overlaps, an event maps to its ONE bin, and the join key is the bin
    * id with the true containment predicate as a residual filter. Each
    * qualifying (event, interval) pair meets in exactly one bin — the
    * event's — so no post-join dedup is needed. At 100 TB both sides
    * shuffle by bin id (or the small interval side broadcasts, as it does
    * here); a pathological hot bin would salt the interval side — the same
    * skew lever as any hash join. Bin width is a dial: it must be ≥ the
    * longest interval for the ≤2-bin bound (wider bins = fewer join rows
    * to filter, narrower = more replication).
    *
    * Window semantics are half-open [start, start+w): the opening error is
    * counted, a boundary event at exactly +w is not.
    */
  def eventsInIncidentWindows(events: DataFrame, windowMinutes: Int = 30,
                              userMod: Long = 50): DataFrame = {
    val binUs = windowMinutes.toLong * 60L * 1000000L
    val intervals = events
      .filter(col("event_type") === "error" &&
        pmod(col("user_id"), lit(userMod)) === 0)
      .select(col("event_id").as("interval_id"),
        col("ts").as("win_start"),
        (col("ts") + expr(s"INTERVAL $windowMinutes MINUTES")).as("win_end"))
    val binned = intervals.withColumn("bin",
      explode(sequence(expr(s"unix_micros(win_start) div ${binUs}L"),
        expr(s"unix_micros(win_end) div ${binUs}L"))))
    events
      .withColumn("bin", expr(s"unix_micros(ts) div ${binUs}L"))
      .join(binned, Seq("bin"))
      .filter(col("ts") >= col("win_start") && col("ts") < col("win_end"))
      .groupBy(col("interval_id"), col("win_start"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L))
          .as("n_errors"))
  }

  /** The 100 TB scale path for [[eventsInIncidentWindows]]'s COUNT
    * metrics: per-interval `n_events`/`n_errors` by CUMULATIVE-RANK
    * DIFFERENCES instead of pair enumeration.
    *
    * Why it exists (SCALE.md 100× addendum): the pair-based form's join
    * output is inherently quadratic in corpus DENSITY — events-per-window
    * and window count both grow with N over a fixed time range, so
    * matching pairs grow ×100 per ×10 data (measured exactly: 30 k → 3.0 M
    * → 302 M). That cost is unavoidable for per-pair metrics like
    * `countDistinct(user_id)`, but pure counts need only
    * `rank(win_end) − rank(win_start)` where `rank(t)` = events strictly
    * before `t`.
    *
    * Plan: one union of events and interval boundaries, per-BIN window
    * ranks (partitioned by the fixed 30-minute bins — no global sort, no
    * row-scale single-partition window), plus a bin-level cumulative
    * offset over the METADATA-scale bin relation (one row per bin of the
    * corpus's time range — the broadcast/collected-codebook class). Join
    * output is LINEAR in N; total cost O((N + I) · log per-bin) vs the
    * pair form's Θ(N²/T). Intervals are never empty (each contains its
    * seed error at `win_start`, inclusive), so inner-join oracles see
    * every interval.
    */
  def eventsInIncidentWindowsRanked(events: DataFrame, windowMinutes: Int = 30,
                                    userMod: Long = 50): DataFrame = {
    val binUs = windowMinutes.toLong * 60L * 1000000L
    val ev = events.filter(col("ts").isNotNull) // SQL join semantics: null ts never matches
    val intervals = ev
      .filter(col("event_type") === "error" &&
        pmod(col("user_id"), lit(userMod)) === 0)
      .select(col("event_id").as("interval_id"),
        col("ts").as("win_start"),
        (col("ts") + expr(s"INTERVAL $windowMinutes MINUTES")).as("win_end"))
    val evTagged = ev.select(
      col("ts"), lit(1L).as("is_ev"),
      when(col("event_type") === "error", 1L).otherwise(0L).as("is_err"),
      lit(null).cast("long").as("interval_id"),
      lit(null).cast("string").as("kind"))
    def boundary(tsCol: String, kind: String) = intervals.select(
      col(tsCol).as("ts"), lit(0L).as("is_ev"), lit(0L).as("is_err"),
      col("interval_id"), lit(kind).as("kind"))
    val tagged = evTagged
      .unionByName(boundary("win_start", "s"))
      .unionByName(boundary("win_end", "e"))
      .withColumn("bin", expr(s"unix_micros(ts) div ${binUs}L"))

    // within-bin running counts; boundaries (is_ev = 0) sort BEFORE events
    // at the same instant, so a boundary's running sum counts exactly the
    // events strictly before its ts — start inclusive / end exclusive falls
    // out of the tie order, no epsilon arithmetic
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bin")).orderBy(col("ts"), col("is_ev"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val ranked = tagged
      .withColumn("local_ev", sum(col("is_ev")).over(w))
      .withColumn("local_err", sum(col("is_err")).over(w))

    // bin-level prefix totals: ONE ROW PER BIN of the corpus time range —
    // metadata-scale by construction (fixed calendar / bin width), so the
    // ordered cumulative window over it is the collected-codebook class,
    // not a row-scale global sort; it then rides a broadcast join back
    val wb = org.apache.spark.sql.expressions.Window.orderBy(col("bin"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val binCum = tagged.groupBy(col("bin"))
      .agg(sum(col("is_ev")).as("bin_ev"), sum(col("is_err")).as("bin_err"))
      .select(col("bin"),
        coalesce(sum(col("bin_ev")).over(wb), lit(0L)).as("cum_ev"),
        coalesce(sum(col("bin_err")).over(wb), lit(0L)).as("cum_err"))

    val bounds = ranked.filter(col("kind").isNotNull)
      .join(broadcast(binCum), Seq("bin"))
      .select(col("interval_id"), col("kind"), col("ts"),
        (col("cum_ev") + col("local_ev")).as("rank_ev"),
        (col("cum_err") + col("local_err")).as("rank_err"))

    bounds.groupBy(col("interval_id"))
      .agg(
        max(when(col("kind") === "s", col("ts"))).as("win_start"),
        (max(when(col("kind") === "e", col("rank_ev"))) -
          max(when(col("kind") === "s", col("rank_ev")))).as("n_events"),
        (max(when(col("kind") === "e", col("rank_err"))) -
          max(when(col("kind") === "s", col("rank_err")))).as("n_errors"))
      .select(col("interval_id"), col("win_start"), col("n_events"),
        col("n_errors"))
  }

  /** The Q17 ("small-quantity order revenue") SQL, written ONCE and shared
    * verbatim by the Spark query (over temp views) and the DuckDB oracle
    * (over the parquet views) — the correlated-scalar-subquery surface:
    * per-brand revenue from lineitems below 20% of their part's average
    * quantity. The per-part average is decimal-exact (partition-order-
    * proof) and the revenue sum is rounded on the shared 1e-4 grid. */
  private[graft] def smallQuantitySql(lineitem: String, part: String): String =
    s"""SELECT p_brand,
       floor((CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,10))) AS DOUBLE)
              / 7.0) * 1e4 + 0.5) / 1e4 AS avg_yearly,
       CAST(COUNT(*) AS BIGINT) AS n_small
     FROM $lineitem l JOIN $part p ON p.p_partkey = l.l_partkey
     WHERE l.l_quantity < (
       SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(38,10))) AS DOUBLE)
                     / COUNT(*))
       FROM $lineitem l2 WHERE l2.l_partkey = l.l_partkey)
     GROUP BY p_brand"""

  /** TPC-H Q17 shape — the CORRELATED SCALAR SUBQUERY the engine's SQL
    * surface must decorrelate: "revenue lost to small-quantity orders",
    * where "small" is relative to each part's own average. Catalyst
    * rewrites the per-row subquery into ONE per-part aggregate joined
    * back (RewriteCorrelatedScalarSubquery) — the spec pins that the
    * physical plan carries no subquery node and exactly the two hash
    * joins + two aggregates the rewrite promises. At 100 TB that is the
    * difference between |lineitem| subquery executions and one extra
    * shuffle-free-ish aggregate over the same scan. */
  def smallQuantityRevenue(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val spark = lineitem.sparkSession
    lineitem.createOrReplaceTempView("graft_q17_lineitem")
    part.createOrReplaceTempView("graft_q17_part")
    spark.sql(smallQuantitySql("graft_q17_lineitem", "graft_q17_part"))
  }

  /** TPC-H Q18 shape — large-volume orders: the GROUP-BY-HAVING derived
    * table used as a semi-join filter. The qualifying order set (orders
    * whose total line quantity exceeds `minQty`) is computed by ONE hash
    * aggregation over lineitem's two relevant columns, and — being
    * HAVING-filtered to a tiny fraction of orders — rides a BROADCAST
    * semi join back onto orders; customer joins WITHOUT a hint. At 100 TB
    * the aggregate shuffles only (orderkey, partial-sum) pairs with
    * map-side combine, and nothing re-scans lineitem twice: the sum is
    * carried out of the derived table instead of recomputed.
    *
    * Broadcast discipline (round-8 verdict #3): `bigOrders` keeps an
    * explicit hint because its size is a SELECTIVITY property (the
    * HAVING cut admits a handful of orders at any SF) that planning-time
    * file stats cannot see. `customer` grows linearly with SF, so it
    * gets NO hint — Spark's stats gate (sizeInBytes vs
    * autoBroadcastJoinThreshold, re-checked at runtime by AQE) picks
    * BHJ while it fits and degrades to a shuffle join when it doesn't,
    * instead of an executor OOM. PlanRegressionSpec pins that the
    * unhinted side still broadcasts at test SF. */
  def largeOrders(customer: DataFrame, orders: DataFrame,
                  lineitem: DataFrame, minQty: Double): DataFrame = {
    val bigOrders = lineitem
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > minQty)
    orders
      .join(broadcast(bigOrders), orders("o_orderkey") === bigOrders("l_orderkey"))
      .join(customer, orders("o_custkey") === customer("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), roundFixed(col("o_totalprice"), 2).as("total_price"),
        col("sum_qty"))
  }

  /** TPC-H Q15 shape — "the top supplier(s)": a revenue view consumed
    * twice, once per supplier and once reduced to its global max, with
    * the max folded back as an equality filter. The per-supplier revenue
    * is ONE hash agg over the date-pruned lineitem scan (filter reaches
    * the parquet scan; two data columns read); the global max is a
    * second agg over that supplier-count-sized result — metadata scale —
    * and joins back in as a single-row broadcast. Revenue is rounded on
    * the shared decimal grid BEFORE the max comparison, so the
    * tie/equality semantics are bit-identical to the oracle's. */
  def topRevenueSuppliers(supplier: DataFrame, lineitem: DataFrame,
                          fromDate: String, untilDate: String): DataFrame = {
    val revenue = lineitem
      .filter(col("l_shipdate") >= to_timestamp(lit(fromDate)) &&
        col("l_shipdate") < to_timestamp(lit(untilDate)))
      .groupBy(col("l_suppkey"))
      .agg(sumRounded(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 2)
        .as("total_revenue"))
    val maxRevenue = revenue.agg(max(col("total_revenue")).as("max_revenue"))
    // maxRevenue is provably one row -> hint stays; supplier grows with
    // SF -> no hint, stats-gated by Spark/AQE (round-8 verdict #3)
    revenue
      .join(broadcast(maxRevenue), col("total_revenue") === col("max_revenue"))
      .join(supplier, col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
  }

  /** RETENTION COHORT analysis — the classic product-analytics matrix
    * (signup cohort × weeks-since-signup → distinct active users) that
    * every events warehouse serves: cohort = the ISO week of a user's
    * FIRST event, offset = whole weeks between that and each activity
    * week, cell = exact distinct users. Computed with ONE shuffle on
    * user_id: the cohort week rides a min-over-window on the same
    * partitioning instead of a groupBy + join back (which would shuffle
    * events twice), then one metadata-scale aggregation on the
    * (cohort, offset) matrix — at 100 TB the matrix is dozens of rows
    * whatever the event volume. Distinct counts are exact (the HLL/KMV
    * sketch family covers the approximate tier). */
  def retentionCohorts(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    events
      .withColumn("activity_week", date_trunc("week", col("ts")).cast("date"))
      .withColumn("cohort_week", min(col("activity_week")).over(w))
      .withColumn("week_offset",
        (datediff(col("activity_week"), col("cohort_week")) / 7)
          .cast("int"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
  }

  /** TPC-H Q2 shape — "the cheapest supplier(s) per part": the
    * CORRELATED SCALAR MIN subquery (`cost = (SELECT min(cost) ...
    * WHERE same part)`), the one classical decorrelation class the
    * Q15/Q17/Q18/Q21/Q22 family didn't cover. Spark runs the
    * decorrelated form — one per-part min aggregate joined back on
    * (part, cost) equality — while the DuckDB oracle runs the classical
    * correlated SQL: the hash match proves the rewrite. Unit cost is
    * 1e-4-quantized BEFORE both the min and the equality (grid doubles
    * compare exactly on both engines); ties keep every minimal supplier
    * (Q2 semantics). At 100 TB: one map-side-combined aggregate over
    * two slim columns, a shuffled equi-join back, and a stats-gated
    * supplier dim join — no per-row subquery execution. */
  def cheapestSupplierPerPart(supplier: DataFrame,
                              lineitem: DataFrame): DataFrame = {
    val costs = lineitem
      .filter(col("l_quantity") > 0.0)
      .select(col("l_partkey"), col("l_suppkey"),
        roundFixed(col("l_extendedprice") / col("l_quantity"), 4).as("cost"))
    val minCost = costs.groupBy(col("l_partkey").as("mp"))
      .agg(min(col("cost")).as("min_cost"))
    costs
      .join(minCost, col("l_partkey") === col("mp") &&
        col("cost") === col("min_cost"))
      .select(col("l_partkey"), col("l_suppkey"), col("min_cost"))
      .distinct()
      .join(supplier, col("l_suppkey") === col("s_suppkey"))
      .select(col("l_partkey"), col("l_suppkey"), col("s_name"),
        col("min_cost"))
  }

  /** TPC-H Q20 shape — "dominant suppliers": the CORRELATED AGGREGATE
    * IN A PREDICATE class (`sum(qty for this supp+part) > fraction ×
    * (SELECT sum(qty) ... same part)`). Spark decorrelates into an
    * aggregate-of-aggregate — the per-(part, supplier) sums roll up to
    * per-part totals WITHOUT rescanning lineitem — joined back and
    * filtered; DuckDB replays the classical correlated form. The
    * predicate compares small-integer multiples of 1e-4-grid doubles
    * (20·supp > 3·total, i.e. fraction 0.15 — the corpus's ~27 suppliers
    * per part cap the max share at ~0.25, so 0.15 is the honest
    * non-vacuous bar) so the boundary is bit-deterministic on both
    * engines. At 100 TB: ONE lineitem scan, one shuffle of slim
    * (part, supp, partial-sum) rows, and the part totals come from a
    * WINDOW SUM over that aggregate's own output — no second scan, no
    * self-join (a naive aggregate-twice-and-join plan scans lineitem
    * twice: the two subtrees prune differently, so even AQE's exchange
    * reuse cannot unify them — measured before this shape was chosen).
    * The window sum runs decimal-backed, so the totals are
    * partition-order-proof like every other rounded sum here. */
  def dominantSuppliers(supplier: DataFrame, lineitem: DataFrame): DataFrame = {
    // spread the single-split scan ahead of the decimal-heavy partial agg
    // (round-17, the pricing-family discipline): without it the per-row
    // decimal casts run on one core. Keyed on l_partkey — already in the
    // read set, and the agg reshuffles on it anyway. Measured
    // 1.21 → 0.50 s at sf0.1, rows identical; no-op on any scan that
    // already spans the cluster.
    val perSupp = Spread.byKey(lineitem, col("l_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sumRounded(col("l_quantity"), 4).as("supp_qty"))
    val w = Window.partitionBy(col("l_partkey"))
    val withTotal = perSupp.withColumn("part_qty",
      roundFixed(sum(col("supp_qty")
        .cast(org.apache.spark.sql.types.DecimalType(38, 10))).over(w)
        .cast("double"), 4))
    withTotal
      .filter(lit(20.0) * col("supp_qty") > lit(3.0) * col("part_qty"))
      .join(supplier, col("l_suppkey") === col("s_suppkey"))
      .select(col("l_partkey"), col("l_suppkey"), col("s_name"),
        col("supp_qty"), col("part_qty"))
  }

  /** TPC-H Q21 shape — "suppliers who kept orders waiting": the
    * EXISTS / NOT-EXISTS pair over the SAME fact table, expressed as the
    * left-semi + left-anti joins Catalyst would decorrelate the
    * subqueries into. A line is late when it shipped more than
    * `lateDays` after its order date. A late line l1 is *blamed* on its
    * supplier when the order has another supplier's line (EXISTS — the
    * order genuinely had alternatives) but no OTHER supplier's late line
    * (NOT EXISTS — this supplier alone held it up). Both probe sides are
    * lineitem projected to (orderkey, suppkey) — at scale each is a
    * shuffled semi/anti hash join on orderkey, and the `exists` legs
    * carry two slim columns, never the full fact row. */
  def waitingSupplierBlame(supplier: DataFrame, orders: DataFrame,
                           lineitem: DataFrame, lateDays: Int): DataFrame = {
    val lines = lineitem.select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
    val late = lines
      .join(orders.select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr(s"INTERVAL $lateDays DAYS"))
      .select(col("l_orderkey"), col("l_suppkey"))
    val l1 = late.select(col("l_orderkey").as("o1"), col("l_suppkey").as("s1"))
    // EXISTS: another supplier has any line on the same order
    val others = lines.select(col("l_orderkey").as("o2"), col("l_suppkey").as("s2"))
    val withAlt = l1.join(others,
      col("o1") === col("o2") && col("s1") =!= col("s2"), "leftsemi")
    // NOT EXISTS: no other supplier was ALSO late on that order
    val lateOthers = late.select(col("l_orderkey").as("o3"), col("l_suppkey").as("s3"))
    val soleBlame = withAlt.join(lateOthers,
      col("o1") === col("o3") && col("s1") =!= col("s3"), "leftanti")
    soleBlame
      .join(supplier, col("s1") === col("s_suppkey"))  // SF-growing dim: stats-gated, no hint
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
  }

  /** TPC-H Q22 shape — "rich but idle customers": an uncorrelated scalar
    * subquery (the average positive account balance) gating the probe
    * side, then an anti join against recent orders, then a small rollup
    * by market segment. The scalar average is decimal-exact and rides in
    * as a single-row broadcast; the anti join's build side is orders
    * pre-filtered to the recency window (date filter pushed to the scan,
    * one column read), so at 100 TB the build input is the recent slice,
    * not order history. */
  def richIdleCustomers(customer: DataFrame, orders: DataFrame,
                        sinceDate: String): DataFrame = {
    val avgBal = customer
      .filter(col("c_acctbal") > 0.0)
      .agg(avgRounded(col("c_acctbal"), 4).as("avg_bal"))
    val recent = orders
      .filter(col("o_orderdate") >= to_timestamp(lit(sinceDate)))
      .select(col("o_custkey"))
    customer
      .join(broadcast(avgBal), col("c_acctbal") > col("avg_bal"))
      .join(recent, col("c_custkey") === col("o_custkey"), "leftanti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_custs"),
        sumRounded(col("c_acctbal"), 2).as("total_bal"))
  }

  /** K-anonymity by ladder generalization with per-level re-counting —
    * the privacy pass a data-release pipeline runs (Sweeney 2002; the
    * Samarati generalization-lattice idea on a fixed single-attribute
    * ladder). Quasi-identifiers are (mktsegment, nationkey, acctbal);
    * acctbal generalizes through widening buckets (100 → 1000 → 10000)
    * and rows whose class never reaches k are SUPPRESSED outright.
    *
    * The load-bearing subtlety: class counts at each level are computed
    * over the rows STILL UNSETTLED at that level — not over everyone's
    * level-ℓ image. Counting over all rows would let a row publish at a
    * coarse level whose class is mostly rows that already published at a
    * finer one, leaving the published group BELOW k (the local-recoding
    * trap). The cascade publishes level-by-level, so every published
    * (level, label) group provably has ≥ k members — the spec asserts
    * exactly that on the OUTPUT.
    *
    * Shape: 3 rounds of (bounded class agg + equi-join) over a shrinking
    * remainder — class tables are quasi-identifier-scale, the data is
    * touched once per level it survives to, nothing collects except the
    * 1-row suppressed-class count. */
  def kAnonymize(customer: DataFrame, k: Int = 5): DataFrame = {
    val widths = Seq(100L, 1000L, 10000L)
    var remainder = customer.select(col("c_custkey"), col("c_mktsegment"),
      col("c_nationkey"), col("c_acctbal"))
    var published: Seq[DataFrame] = Nil
    widths.zipWithIndex.foreach { case (wd, lvl) =>
      val bucketed = remainder.withColumn("b",
        floor(col("c_acctbal") / lit(wd.toDouble)).cast("long"))
      val counts = bucketed
        .groupBy(col("c_mktsegment"), col("c_nationkey"), col("b"))
        .agg(count(lit(1)).as("class_size"))
      val joined = bucketed.join(counts,
        Seq("c_mktsegment", "c_nationkey", "b"))
      published = published :+ joined.filter(col("class_size") >= k)
        .select(col("c_custkey").as("custkey"), lit(lvl).as("level"),
          concat(col("c_mktsegment"), lit("|"),
            col("c_nationkey").cast("string"), lit("|["),
            (col("b") * wd).cast("string"), lit(","),
            ((col("b") + 1) * wd).cast("string"), lit(")"))
            .as("quasi_label"),
          col("class_size"))
      remainder = joined.filter(col("class_size") < k)
        .select(col("c_custkey"), col("c_mktsegment"), col("c_nationkey"),
          col("c_acctbal"))
    }
    val suppressedSize = remainder.agg(count(lit(1)).as("class_size"))
    val suppressed = remainder.select(col("c_custkey").as("custkey"))
      .crossJoin(broadcast(suppressedSize))
      .select(col("custkey"), lit(widths.length).as("level"),
        lit("*").as("quasi_label"), col("class_size"))
    (published :+ suppressed).reduce(_ unionByName _)
  }

  /** Differentially-private-CALIBRATED noisy counts (Dwork et al. 2006
    * Laplace mechanism — the release pattern next to [[kAnonymize]] in
    * the privacy family): per-group counts plus Laplace(Δf/ε) noise,
    * Δf = 1 for counting queries. The noise here is DERIVED
    * DETERMINISTICALLY from the group key (portable sha-hash → uniform
    * in (0,1) → inverse Laplace CDF), which makes the release
    * reproducible and DuckDB-oracle-able; a production deployment swaps
    * the key-hash for a CSPRNG draw — the mechanism's calibration,
    * plumbing, and post-processing (rounding, non-negativity clamp) are
    * exactly what ships. The noisy count is quantized 1e-4 and floored
    * at 0 (post-processing preserves DP).
    *
    * Plan: ONE hash aggregate (group-scale), noise a per-group scalar
    * expression — the privacy layer adds zero data movement. */
  def dpNoisyCounts(customer: DataFrame, epsilon: Double = 1.0): DataFrame = {
    // +0.5 keeps u strictly inside (0,1): u = 0 would put the inverse
    // CDF at ln(0) = -inf (the hash is 60-bit, in [0, 2^60))
    val u = (graft.operators.TextOps.portableHash64(
      concat(lit("dp:"), col("c_mktsegment"), lit("|"),
        col("c_nationkey").cast("string")))
      .cast("double") + lit(0.5)) / lit(1152921504606846976.0)
    // inverse Laplace CDF at u: -b*sign(u-1/2)*ln(1-2|u-1/2|), b = 1/eps
    val c = u - lit(0.5)
    val noise = lit(-1.0 / epsilon) * signum(c) *
      log(lit(1.0) - lit(2.0) * abs(c))
    customer
      .groupBy(col("c_mktsegment"), col("c_nationkey"))
      .agg(count(lit(1)).as("true_count"))
      .select(col("c_mktsegment"), col("c_nationkey"),
        greatest(lit(0.0),
          roundFixed(col("true_count").cast("double") + noise, 4))
          .as("noisy_count"))
  }

  /** TPC-H Q14 promotion-effect ratio — the conditional-aggregate shape
    * (CASE inside SUM, two aggregates in one pass, ratio at the edge):
    * of one month's shipped revenue, the percentage on PROMO parts. The
    * date range prunes lineitem AT THE SCAN (pushed filters), the part
    * join stats-gates to broadcast, and both sums ride one hash
    * aggregate — the ratio divides the two decimal-exact ROUNDED sums,
    * so no unrounded float crosses the engine boundary. */
  /** TPC-H Q3 (shipping priority): segment-filtered customers ⋈ open
    * orders ⋈ future-shipping lineitems, revenue per order, top-k. The
    * filters all reach their scans (segment on customer, date on orders
    * and lineitem — `.explain` shows PushedFilters on all three), the
    * dimension-side joins stats-gate to broadcast at test SF (customer
    * is SF-growing: no hint), and the top-k is a TakeOrderedAndProject —
    * only k rows per partition reach the driver-side final ordering. */
  def shippingPriority(customer: DataFrame, orders: DataFrame,
                       lineitem: DataFrame, segment: String = "BUILDING",
                       date: String = "1998-01-01", k: Int = 10): DataFrame = {
    val disc = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    customer.filter(col("c_mktsegment") === segment)
      .join(orders, col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") < to_timestamp(lit(date)))
      .join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") > to_timestamp(lit(date)))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sumRounded(disc, 2).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(k)
      .select(col("l_orderkey"), col("revenue"), col("o_orderdate"))
  }

  /** TPC-H Q4's EXISTS shape on this schema (lineitem carries no
    * commit/receipt dates): orders with at least one line item shipped
    * AFTER the order date, counted per priority class. The correlated
    * EXISTS is declared as a LEFT SEMI join with a non-equi conjunct —
    * Spark keeps the equi key as the hash join key and evaluates the
    * date comparison as the join residual, so each order probes once and
    * short-circuits on the first match (no row multiplication, no
    * distinct needed — the semi join IS the dedup). */
  def latePriorityOrders(orders: DataFrame, lineitem: DataFrame): DataFrame =
    orders
      .join(lineitem,
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))

  /** TPC-H Q19's disjunctive-predicate shape (no p_container column here;
    * brand × size-range × quantity-range branches instead): revenue over
    * an OR of conjunctions that each mix columns from BOTH join sides.
    * The planning story is the point: Catalyst factors the part-only
    * half of each branch out of the disjunction and pushes
    * `(brand=12 ∧ size≤5) ∨ (brand=23 ∧ size≤10) ∨ (brand=4 ∧ size≤15)`
    * down to the part SCAN (PushedFilters shows the Or tree —
    * spec-pinned), so the join build side is pre-shrunk ~8× before the
    * residual mixed predicate runs. */
  def disjunctiveRevenue(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val disc = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    val branches =
      (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
        col("l_quantity").between(1, 11)) ||
      (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
        col("l_quantity").between(10, 20)) ||
      (col("p_brand") === "Brand#4" && col("p_size").between(1, 15) &&
        col("l_quantity").between(20, 30))
    lineitem
      .join(part, col("l_partkey") === col("p_partkey"))
      .filter(branches)
      .agg(sumRounded(disc, 2).as("revenue"), count(lit(1)).as("n_items"))
  }

  /** TPC-H Q21's multi-join semi/anti shape (suppliers who kept orders
    * waiting), on this schema (lineitem carries no commit/receipt dates
    * — the "late line" marker is l_returnflag = 'R'): for finished
    * orders, count per supplier the late lines where ANOTHER supplier
    * contributed to the order (EXISTS) but NO OTHER supplier was late
    * (NOT EXISTS on the same table). The planning story is the point:
    * the correlated EXISTS / NOT EXISTS pair declares as one LEFT SEMI
    * and one LEFT ANTI join against the SAME lineitem relation, each
    * with the equi orderkey as the hash key and the `suppkey <>`
    * disequality as the join residual — no row multiplication, no
    * distinct, and the anti side is pre-filtered to late lines so its
    * build input is a third of the table. Orders filters to status 'F'
    * at the scan; the nation filter reduces supplier 25× before the
    * supplier join; only nation (fixed 25 rows) is broadcast-hinted —
    * supplier grows with SF, so its join stays stats-gated. */
  def waitingSuppliers(supplier: DataFrame, lineitem: DataFrame,
                       orders: DataFrame, nation: DataFrame,
                       nationName: String = "NATION_7"): DataFrame = {
    val others = lineitem.select(col("l_orderkey").as("l2_orderkey"),
      col("l_suppkey").as("l2_suppkey"))
    val otherLate = lineitem.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey").as("l3_orderkey"),
        col("l_suppkey").as("l3_suppkey"))
    lineitem.filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_suppkey"))
      .join(orders.filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      .join(others, col("l2_orderkey") === col("l_orderkey") &&
        col("l2_suppkey") =!= col("l_suppkey"), "left_semi")
      .join(otherLate, col("l3_orderkey") === col("l_orderkey") &&
        col("l3_suppkey") =!= col("l_suppkey"), "left_anti")
      .join(supplier
          .join(broadcast(nation.filter(col("n_name") === nationName)),
            col("n_nationkey") === col("s_nationkey"))
          .select(col("s_suppkey"), col("s_name")),
        col("s_suppkey") === col("l_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
  }

  /** TPC-H Q20's excess-stock shape on this schema (no partsupp table —
    * the availability ledger IS lineitem): suppliers who in `year`
    * shipped, for some name-filtered part, MORE than half that
    * (supplier, part) pair's all-time shipped quantity, counted per
    * supplier within one nation. The correlated scalar here ranges over
    * the SAME relation as the outer aggregate
    * (`sum(qty) in year > 0.5 × sum(qty) all-time per (supp, part)`), so
    * the decorrelation collapses past Q17's agg-side join into ONE
    * conditional aggregate — both sums in a single pass over the
    * part-pruned lineitem, no self-join at all (with a separate ledger
    * table it would be Q17's join-back; same-relation correlation earns
    * the stronger rewrite). The threshold comparison is decimal-exact
    * (`2·qty_year > qty_total` — no float ever crosses the engine
    * boundary), the part name filter pushes to the part scan and prunes
    * lineitem via LEFT SEMI before the aggregate, and only nation
    * (fixed 25 rows) is broadcast-hinted — supplier grows with SF and
    * stays stats-gated. */
  def excessShippers(lineitem: DataFrame, part: DataFrame,
                     supplier: DataFrame, nation: DataFrame,
                     namePrefix: String = "small", yr: Int = 1996,
                     nationName: String = "NATION_7"): DataFrame = {
    val wide = DecimalType(38, 10)
    val parts = part.filter(col("p_name").startsWith(namePrefix))
      .select(col("p_partkey"))
    val pairAgg = lineitem
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"),
        col("l_shipdate"))
      .join(parts, col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(
        sum(when(year(col("l_shipdate")) === yr, col("l_quantity"))
          .otherwise(lit(0.0)).cast(wide)).as("qty_year"),
        sum(col("l_quantity").cast(wide)).as("qty_total"))
    pairAgg
      .filter(lit(2) * col("qty_year") > col("qty_total"))
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_excess_parts"))
      .join(supplier
          .join(broadcast(nation.filter(col("n_name") === nationName)),
            col("n_nationkey") === col("s_nationkey"))
          .select(col("s_suppkey"), col("s_name")),
        col("s_suppkey") === col("l_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_excess_parts"))
  }

  /** TPC-H Q8's two-level agg-over-join shape (national market share):
    * the inner level builds per-line volume over a five-way join —
    * lineitem ⋈ type-filtered part ⋈ orders ⋈ region-filtered customers
    * ⋈ supplier ⋈ nation — and the outer level aggregates the SAME rows
    * twice per year (the share nation's volume and the total) so the
    * ratio needs exactly one hash aggregate, never a self-join of two
    * aggregated relations. Distribution: the customer region membership
    * comes from a LEFT SEMI against a broadcast nation⋈region product
    * (fixed 25×5 rows — the only broadcast hints; part, customer, and
    * supplier all grow with SF and stay stats-gated), and both sums are
    * decimal-exact then rounded BEFORE the ratio, so no
    * order-dependent float crosses the engine boundary. */
  def nationMarketShare(lineitem: DataFrame, orders: DataFrame,
                        customer: DataFrame, supplier: DataFrame,
                        nation: DataFrame, region: DataFrame,
                        part: DataFrame, regionName: String = "ASIA",
                        shareNation: String = "NATION_7",
                        pType: String = "ECONOMY"): DataFrame = {
    val disc = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    val regionNations = nation
      .join(broadcast(region.filter(col("r_name") === regionName)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("rn_key"))
    val regionCustomers = customer
      .join(broadcast(regionNations),
        col("c_nationkey") === col("rn_key"), "left_semi")
      .select(col("c_custkey"))
    val suppNation = nation.select(col("n_nationkey").as("sn_key"),
      col("n_name").as("supp_nation"))
    lineitem
      .join(part.filter(col("p_type") === pType)
        .select(col("p_partkey")),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .join(orders.select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate")), col("l_orderkey") === col("o_orderkey"))
      .join(regionCustomers, col("o_custkey") === col("c_custkey"),
        "left_semi")
      .join(supplier.select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(suppNation), col("s_nationkey") === col("sn_key"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        sumRounded(when(col("supp_nation") === shareNation, disc)
          .otherwise(lit(0.0)), 2).as("share_rev"),
        sumRounded(disc, 2).as("total_rev"))
      .select(col("o_year"),
        // nullif guards the degenerate year whose volumes all round to
        // 0.00: 0/0 would publish NaN — emit NULL instead, mirrored in
        // the oracle (round-11 advisor)
        roundFixed(col("share_rev") / nullif(col("total_rev"), lit(0.0)), 6)
          .as("mkt_share"),
        col("share_rev"), col("total_rev"))
  }

  /** TPC-H Q6 shape — the pure scan-predicate global aggregate (revenue
    * forecast): THREE independent range predicates (date window, discount
    * band, quantity cap) that must ALL reach the parquet scan as pushed
    * filters, a two-column arithmetic payload, and one global aggregate.
    * There is no join and no keyed shuffle anywhere — the entire query is
    * a scan whose cost at 100 TB is decided solely by predicate pushdown
    * and column pruning (4 of 11 lineitem columns read: the two payload
    * columns plus the two non-date filter columns; with date-partitioned
    * or min/max-indexed storage the date window prunes whole files
    * before any row is read). The revenue product quantizes per row to
    * DECIMAL(38,10) (the shared grid) so the partial+final aggregation
    * is partition-order-proof. Completes the classic TPC-H shape set —
    * every one of Q1-Q22's plan patterns now has an adapted, oracled
    * representative. */
  def forecastRevenue(lineitem: DataFrame,
                      fromDate: String = "1996-01-01",
                      untilDate: String = "1997-01-01",
                      discLo: Double = 0.05, discHi: Double = 0.07,
                      maxQty: Double = 24.0): DataFrame =
    lineitem
      .filter(col("l_shipdate") >= to_timestamp(lit(fromDate)) &&
        col("l_shipdate") < to_timestamp(lit(untilDate)) &&
        col("l_discount").between(discLo, discHi) &&
        col("l_quantity") < maxQty)
      .agg(count(lit(1)).as("n_lines"),
        sumRounded(col("l_extendedprice") * col("l_discount"), 2)
          .as("revenue"))

  /** TPC-H Q12 shape on this schema (no l_shipmode column — l_returnflag
    * is the mode surrogate): the BIG-BIG equi join with conditional
    * aggregation. lineitem pre-filters by the mode IN-list and date
    * window (both pushed to the scan — the fact shrinks before the
    * shuffle), orders contributes exactly two columns, and the
    * priority split is a pair of conditional sums over the SAME rows —
    * one aggregate, never two joins or a pivot. Unlike the dimension
    * joins elsewhere, BOTH sides here grow with SF — this is the plan
    * library's canonical stats-gated big-big join: broadcast at test SF,
    * a co-partitioned shuffle join at 100 TB, chosen by Spark/AQE rather
    * than a hint that would OOM an executor at scale. */
  def shipmodePriorityCounts(orders: DataFrame, lineitem: DataFrame,
                             modes: Seq[String] = Seq("R", "A"),
                             fromDate: String = "1996-01-01",
                             untilDate: String = "1998-01-01"): DataFrame = {
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    lineitem
      .filter(col("l_returnflag").isin(modes: _*) &&
        col("l_shipdate") >= to_timestamp(lit(fromDate)) &&
        col("l_shipdate") < to_timestamp(lit(untilDate)))
      .select(col("l_orderkey"), col("l_returnflag"))
      .join(orders.select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag").as("ship_mode"))
      .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        // low = NOT-high, written as when(high, 0).otherwise(1) — the same
        // shape as the oracle's CASE WHEN high THEN 0 ELSE 1: a NULL
        // o_orderpriority falls to the ELSE branch (counts as low) on BOTH
        // engines, where `when(!high, 1)` would send NULL to otherwise=0
        // and silently diverge (round-12 advisor)
        sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
  }

  /** NULL-planting fixtures (round-13 verdict #6): the TPC-H-shaped
    * queries' NULL contracts — CASE-over-NULL in conditional aggregates,
    * NULL join keys through anti and outer paths — were mirrored by
    * construction but never DATA-exercised: the generated corpus ships no
    * NULL o_orderpriority / o_custkey / user_id, so a NULL-semantics
    * divergence (e.g. `when(!high, 1)` sending NULL to the wrong branch —
    * the exact round-12 advisor near-miss) would pass every gate. Each
    * fixture NULLs a deterministic integer-arithmetic subset (pure
    * function of the corpus, replayed verbatim by the DuckDB oracle — the
    * plantNearDups/plantHeavyUsers discipline), so the `_nulls` twin
    * queries provably push NULLs through the exact operator under test. */
  def plantNullPriorities(orders: DataFrame, mod: Long = 23L,
                          hit: Long = 7L): DataFrame =
    orders.withColumn("o_orderpriority",
      when(pmod(col("o_orderkey"), lit(mod)) === hit, lit(null).cast("string"))
        .otherwise(col("o_orderpriority")))

  /** NULL fact-side FK for the anti-join path ([[danglingStationFks]]):
    * a NULL key matches nothing, so every planted row must surface in the
    * dangling set (one NULL group) — an engine that null-matched or
    * dropped them flips the counts. */
  def plantNullUserIds(events: DataFrame, mod: Long = 31L,
                       hit: Long = 5L): DataFrame =
    events.withColumn("user_id",
      when(pmod(col("event_id"), lit(mod)) === hit, lit(null).cast("long"))
        .otherwise(col("user_id")))

  /** NULL fact-side FK for the outer-join path ([[customerOrderCounts]]):
    * planted orders must vanish from every customer's count/revenue (a
    * NULL key joins no build-side row) while zero-order customers keep
    * their n_orders = 0 / null-revenue rows. */
  def plantNullCustKeys(orders: DataFrame, mod: Long = 29L,
                        hit: Long = 11L): DataFrame =
    orders.withColumn("o_custkey",
      when(pmod(col("o_orderkey"), lit(mod)) === hit, lit(null).cast("long"))
        .otherwise(col("o_custkey")))

  /** TPC-H Q7 shape — bilateral trade volume: the NATION dimension
    * playing TWO ROLES in one query (supplier's nation and customer's
    * nation) with the symmetric OR'd pair predicate
    * `(A→B) OR (B→A)` that references BOTH roles at once — the one
    * classic join-shape the plan library lacked: Catalyst can push the
    * two-name membership into EACH role independently (done here
    * explicitly — the nation dims are pre-filtered to the pair before
    * their joins, so each dimension join prunes ~2/25 of its fact rows),
    * but the pair predicate itself is only evaluable ABOVE both joins
    * and must survive as a post-join residual, never a scan filter.
    *
    * Distribution: the two 2-row nation slices are broadcast-hinted
    * (fixed size); the nation-pruned supplier/customer slices grow with
    * SF and stay stats-gated (the round-8 broadcast discipline) — at
    * test SF AQE broadcasts them, at 100 TB they degrade to shuffle
    * joins instead of OOMing an executor. The date filter pushes to the
    * lineitem scan, and the supplier-side prune lands BEFORE the one
    * big shuffle join (orders), so the expensive exchange moves ~2/25
    * of the date-filtered rows. Revenue is decimal-exact then rounded
    * on the shared grid. */
  def nationTradeVolume(lineitem: DataFrame, orders: DataFrame,
                        customer: DataFrame, supplier: DataFrame,
                        nation: DataFrame,
                        nationA: String = "NATION_12",
                        nationB: String = "NATION_13",
                        fromDate: String = "1996-01-01",
                        untilDate: String = "2000-01-01"): DataFrame = {
    val disc = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    val pair = Seq(nationA, nationB)
    val supps = supplier
      .join(broadcast(nation.filter(col("n_name").isin(pair: _*))
          .select(col("n_nationkey").as("sn_key"),
            col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("sn_key"))
      .select(col("s_suppkey"), col("supp_nation"))
    val custs = customer
      .join(broadcast(nation.filter(col("n_name").isin(pair: _*))
          .select(col("n_nationkey").as("cn_key"),
            col("n_name").as("cust_nation"))),
        col("c_nationkey") === col("cn_key"))
      .select(col("c_custkey"), col("cust_nation"))
    lineitem
      .filter(col("l_shipdate") >= to_timestamp(lit(fromDate)) &&
        col("l_shipdate") < to_timestamp(lit(untilDate)))
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"),
        col("l_extendedprice"), col("l_discount"))
      .join(supps, col("l_suppkey") === col("s_suppkey"))
      .join(orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(custs, col("o_custkey") === col("c_custkey"))
      .filter((col("supp_nation") === nationA &&
          col("cust_nation") === nationB) ||
        (col("supp_nation") === nationB && col("cust_nation") === nationA))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(count(lit(1)).as("n_lines"), sumRounded(disc, 2).as("revenue"))
  }

  /** The Q11 ("important stock") SQL, written ONCE and shared verbatim by
    * the Spark query (over temp views) and the DuckDB oracle (over the
    * parquet views) — the UNCORRELATED-scalar-subquery-in-HAVING surface:
    * per-part stock value (from one nation's suppliers; lineitem is this
    * schema's availability ledger, the [[excessShippers]] adaptation)
    * kept only where it exceeds 2× the average per-part value of the
    * same restricted ledger. TPC-H's fixed FRACTION threshold is
    * deliberately replaced by the average-relative one: the synthetic
    * corpus is skew-free, so `> fraction · total` selects a row count
    * that swings from everything to nothing across SFs, while
    * `> 2 · total/count` is scale-invariant.
    *
    * Contrast with [[smallQuantityRevenue]] (Q17): there the subquery is
    * CORRELATED and the right plan REWRITES it away (the spec pins "no
    * Subquery node"); here it is UNCORRELATED and the right plan KEEPS
    * it — one independent scalar job whose result enters the HAVING
    * filter as a literal. That costs a second scan of the restricted
    * ledger; [[topRevenueSuppliers]] (Q15) is the hand-planned twin that
    * reuses the grouped aggregate instead — this entry exists to pin
    * what the SQL SURFACE form plans to, not to replace the hand-tuned
    * shape. Both aggregates quantize per-row to DECIMAL(38,10) (the
    * shared grid), and the threshold comparison runs in double with the
    * identical op order on both engines. */
  private[graft] def importantPartsSql(lineitem: String, supplier: String,
                                       nation: String,
                                       nationName: String): String =
    s"""SELECT l.l_partkey,
         floor(CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount)
                 AS DECIMAL(38,10))) AS DOUBLE) * 1e2 + 0.5) / 1e2
           AS stock_value
       FROM $lineitem l
       JOIN $supplier s ON s.s_suppkey = l.l_suppkey
       JOIN $nation n ON n.n_nationkey = s.s_nationkey
       WHERE n.n_name = '$nationName'
       GROUP BY l.l_partkey
       HAVING CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount)
                AS DECIMAL(38,10))) AS DOUBLE) >
         (SELECT 2.0 * CAST(SUM(CAST(l2.l_extendedprice * (1.0 - l2.l_discount)
                  AS DECIMAL(38,10))) AS DOUBLE)
                / CAST(COUNT(DISTINCT l2.l_partkey) AS DOUBLE)
          FROM $lineitem l2
          JOIN $supplier s2 ON s2.s_suppkey = l2.l_suppkey
          JOIN $nation n2 ON n2.n_nationkey = s2.s_nationkey
          WHERE n2.n_name = '$nationName')"""

  /** TPC-H Q11 shape — see [[importantPartsSql]]. */
  def importantParts(lineitem: DataFrame, supplier: DataFrame,
                     nation: DataFrame,
                     nationName: String = "NATION_12"): DataFrame = {
    val spark = lineitem.sparkSession
    lineitem.createOrReplaceTempView("graft_q11_lineitem")
    supplier.createOrReplaceTempView("graft_q11_supplier")
    nation.createOrReplaceTempView("graft_q11_nation")
    spark.sql(importantPartsSql("graft_q11_lineitem", "graft_q11_supplier",
      "graft_q11_nation", nationName))
  }

  def promoRevenue(lineitem: DataFrame, part: DataFrame,
                   fromDate: String = "1996-03-01",
                   untilDate: String = "1996-04-01"): DataFrame = {
    val disc = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    lineitem
      .filter(col("l_shipdate") >= to_timestamp(lit(fromDate)) &&
        col("l_shipdate") < to_timestamp(lit(untilDate)))
      .join(part, col("l_partkey") === col("p_partkey"))
      .agg(
        sumRounded(when(col("p_type") === "PROMO", disc).otherwise(lit(0.0)), 2)
          .as("promo_rev"),
        sumRounded(disc, 2).as("total_rev"),
        count(lit(1)).as("n_items"))
      .select(
        roundFixed(lit(100.0) * col("promo_rev") / col("total_rev"), 4)
          .as("promo_pct"),
        col("promo_rev"), col("total_rev"), col("n_items"))
  }

  /** Per-user EWMA of event values — the time-series smoothing pass a
    * metrics pipeline runs, built for CROSS-ENGINE bit-determinism: the
    * decay is dyadic (α = 1/2, lag weight 2^-(k+1)), so every weight is
    * an exact IEEE double and weight·value multiplications are EXACT
    * (scaling by a power of two never rounds); the truncated K-lag sum
    * is written as one fixed left-associated chain evaluated identically
    * by both engines — no decimal machinery needed, unlike data-dependent
    * float sums. Missing lags (series head, NULL values) drop out of
    * numerator AND denominator — the truncated-window renormalization —
    * and an all-missing window yields NULL, not 0/0.
    *
    * One window over the user_id shuffle (the sessionize discipline),
    * bounded per-partition state; K is a constant, so the expression is
    * codegen-friendly and the shuffle is the only data movement.
    */
  def eventEwma(events: DataFrame, k: Int = 8): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val terms = (0 until k).map { i =>
      val wi = java.lang.Math.scalb(1.0, -(i + 1)) // 2^-(i+1), exact
      val l = lag(col("value"), i).over(w)
      (when(l.isNotNull, lit(wi) * l).otherwise(lit(0.0)),
        when(l.isNotNull, lit(wi)).otherwise(lit(0.0)))
    }
    val num = terms.map(_._1).reduce(_ + _)
    val den = terms.map(_._2).reduce(_ + _)
    events.select(col("event_id"), col("user_id"),
      when(den > 0.0, roundFixed(num / den, 6))
        .otherwise(lit(null).cast("double")).as("ewma"))
  }

  /** TPC-H Q9-shaped product-profit rollup — the 5-table join headliner
    * (lineitem ⋈ σ(part) ⋈ supplier ⋈ nation ⋈ orders → (nation, year)
    * profit; cost uses p_retailprice·quantity since this schema carries no
    * partsupp). The join order is written selective-first: the p_name
    * substring filter prunes part BEFORE it meets lineitem, so the fact
    * table shrinks at its first join; stats/AQE pick broadcast for the
    * filtered part, supplier, and nation sides (no forced hints — part
    * and supplier grow with SF, the r8 rule), and the one genuinely
    * big-big join (lineitem ⋈ orders on orderkey) is the single
    * shuffle-heavy stage. Profit sums decimal-exact over the same IEEE
    * product expression both engines evaluate.
    */
  def nationProfit(lineitem: DataFrame, part: DataFrame, supplier: DataFrame,
                   orders: DataFrame, nation: DataFrame,
                   namePart: String = "bolt"): DataFrame =
    lineitem
      .join(part.filter(col("p_name").contains(namePart)),
        col("l_partkey") === col("p_partkey"))
      .join(supplier, col("l_suppkey") === col("s_suppkey"))
      .join(nation, col("s_nationkey") === col("n_nationkey"))
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name"), year(col("o_orderdate")).as("o_year"))
      .agg(sumRounded(
        col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
          col("p_retailprice") * col("l_quantity"), 2).as("profit"))

  // --------------------------------------------------------- Pareto skyline

  /** Distributed Pareto skyline (maximal-vector query, Börzsönyi et al.
    * ICDE'01's SKYLINE OF operator) — the rows no other row dominates,
    * where `dims` lists (column, maximize?) and d dominates c iff d is
    * better-or-equal on EVERY dim and strictly better on at least one.
    * Ties on all dims are mutually non-dominating: both survive (the
    * NOT EXISTS semantics the oracle replays).
    *
    * Two-phase shape (the classic distributed skyline): phase 1 filters
    * each partition to its LOCAL skyline in one pass (an O(n·s) dominance
    * buffer inside mapPartitions — s = local skyline size, typically tiny:
    * dominance is transitive, so a row dominated locally can never be in
    * the global answer and is safe to drop early); phase 2 refines the
    * surviving candidates — bounded by |skyline| × partitions, metadata
    * scale next to the input — with a broadcast nested-loop ANTI join of
    * the candidate set against its own dims projection. localCheckpoint
    * truncates the lineage so the expensive upstream (scan + any
    * aggregation) runs ONCE, not once per join side. At 100 TB the
    * upstream pass dominates and parallelizes; the refine touches only
    * candidates. A skyline too big to broadcast means the dims barely
    * constrain each other — at that point the answer itself is
    * table-sized and no algorithm saves you; the operator would recurse
    * (candidates → another local pass) before giving up.
    *
    * NULL dims are rejected loudly (dominance over NULL is undefined;
    * filter upstream).
    */
  def paretoSkyline(rows: DataFrame, dims: Seq[(String, Boolean)]): DataFrame = {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    require(dims.nonEmpty, "skyline needs at least one dimension")
    val schema = rows.schema
    val idx = dims.map { case (f, _) => schema.fieldIndex(f) }
    // per-dim sign-adjusted comparators over the EXTERNAL row values —
    // exact per type (no lossy cast to double for decimals)
    val cmps: Seq[(Row, Row) => Int] = dims.zip(idx).map { case ((f, mx), i) =>
      val sign = if (mx) 1 else -1
      schema(i).dataType match {
        case ByteType | ShortType | IntegerType | LongType => (a: Row, b: Row) =>
          sign * java.lang.Long.compare(
            a.getAs[Number](i).longValue(), b.getAs[Number](i).longValue())
        case DoubleType | FloatType => (a: Row, b: Row) =>
          sign * java.lang.Double.compare(
            a.getAs[Number](i).doubleValue(), b.getAs[Number](i).doubleValue())
        case _: DecimalType => (a: Row, b: Row) =>
          sign * a.getDecimal(i).compareTo(b.getDecimal(i))
        case dt => throw new IllegalArgumentException(
          s"unsupported skyline dim type $dt for column $f")
      }
    }
    def dominates(d: Row, c: Row): Boolean = {
      var allGe = true; var oneGt = false; var k = 0
      while (k < cmps.length && allGe) {
        val cmp = cmps(k)(d, c)
        if (cmp < 0) allGe = false else if (cmp > 0) oneGt = true
        k += 1
      }
      allGe && oneGt
    }
    val dimNames = dims.map(_._1)
    val candidates = rows.mapPartitions { it =>
      val sky = scala.collection.mutable.ArrayBuffer.empty[Row]
      it.foreach { r =>
        idx.zip(dimNames).foreach { case (i, f) =>
          require(!r.isNullAt(i), s"NULL skyline dimension $f") }
        if (!sky.exists(s => dominates(s, r))) {
          val kept = sky.filterNot(s => dominates(r, s))
          sky.clear(); sky ++= kept; sky += r
        }
      }
      sky.iterator
    }(org.apache.spark.sql.Encoders.row(schema))
      .localCheckpoint(false)
    // phase 2: candidate-vs-candidate refine; the right side carries only
    // the dims (renamed, so the anti join output needs no de-aliasing)
    val probe = candidates.select(dimNames.map(f => col(f).as(s"d_$f")): _*)
    val allGe = dims.map { case (f, mx) =>
      if (mx) col(s"d_$f") >= col(f) else col(s"d_$f") <= col(f)
    }.reduce(_ && _)
    val oneGt = dims.map { case (f, mx) =>
      if (mx) col(s"d_$f") > col(f) else col(s"d_$f") < col(f)
    }.reduce(_ || _)
    candidates.join(broadcast(probe), allGe && oneGt, "left_anti")
  }

  /** The skyline driver query: customers Pareto-optimal on
    * (account balance, lifetime spend, order count), all maximized — the
    * "best customer frontier" no weighted score can rank without picking
    * the weights first. One orders aggregation (customer-key shuffle),
    * an unhinted join to customer (both sides grow with SF), then
    * [[paretoSkyline]].
    */
  def customerPareto(customer: DataFrame, orders: DataFrame): DataFrame = {
    val spend = orders.groupBy(col("o_custkey"))
      .agg(sumRounded(col("o_totalprice"), 2).as("total_spend"),
        count(lit(1)).as("n_orders"))
    val m = customer
      .join(spend, col("c_custkey") === col("o_custkey"))
      .select(col("c_custkey").as("custkey"),
        col("c_acctbal").cast("double").as("acctbal"),
        col("total_spend"), col("n_orders"))
    paretoSkyline(m, Seq("acctbal" -> true, "total_spend" -> true,
      "n_orders" -> true))
      .orderBy(col("custkey"))
  }
}
