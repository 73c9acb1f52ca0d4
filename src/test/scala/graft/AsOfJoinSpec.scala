package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{AsOf, AsOfJoinExec}
import graft.sources.Tables

/** The native as-of join (custom LogicalPlan + Strategy + SparkPlan):
  * semantics against hand-built edges, equivalence with the window
  * formulation on real data, and the physical contract (the exec node
  * plans with at most one Exchange per side and no join buffer). */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("backward as-of: latest at-or-before match, ties inclusive, no-match nulls") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")), // after e1/e2 -> e2
      (2L, 10L, ts("2024-01-01 09:00:00")), // tie with e1 -> e1 (inclusive)
      (3L, 10L, ts("2024-01-01 08:00:00")), // before any error -> null
      (4L, 20L, ts("2024-01-01 12:00:00")), // user with no errors -> null
      (5L, 30L, ts("2024-01-01 12:00:00"))  // only later errors -> null
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 09:00:00"), 1.0), // e1
      (10L, ts("2024-01-01 09:30:00"), 2.0), // e2
      (30L, ts("2024-01-01 13:00:00"), 3.0)  // after every user-30 purchase
    ).toDF("e_user", "e_ts", "e_val")

    val out = AsOf.backward(left, right, "user_id", "e_user", "ts", "e_ts")
      .collect().map(r => r.getAs[Long]("event_id") ->
        ((Option(r.getAs[Timestamp]("e_ts")), Option(r.getAs[Any]("e_val"))))).toMap
    assert(out.size == 5)
    assert(out(1L) == ((Some(ts("2024-01-01 09:30:00")), Some(2.0))))
    assert(out(2L) == ((Some(ts("2024-01-01 09:00:00")), Some(1.0))))
    assert(out(3L) == ((None, None)))
    assert(out(4L) == ((None, None)))
    assert(out(5L) == ((None, None)))
  }

  test("native as-of equals the window formulation on real data") {
    val events = Tables.events(spark, dir)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val errors = events.filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("ts").as("e_ts"))
    val native = AsOf.backward(purchases, errors, "user_id", "e_user", "ts", "e_ts")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("e_ts").as("last_error_ts"))
    val window = graft.operators.Relational.lastErrorBeforePurchase(events)
    assert(native.exceptAll(window).count() == 0 &&
      window.exceptAll(native).count() == 0)
    assert(native.count() > 0)
  }

  test("physical contract: AsOfJoinExec node, one Exchange per side, merge not buffer") {
    val events = Tables.events(spark, dir)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val errors = events.filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("ts").as("e_ts"))
    val df = AsOf.backward(purchases, errors, "user_id", "e_user", "ts", "e_ts")
    df.count() // force execution so AQE finalizes the plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan) // nodeName strips the Exec suffix
    val exchanges = "(?m)^\\s*[+:]?[- ]*(?:\\*\\(\\d+\\) )?Exchange".r
      .findAllIn(plan).length
    assert(exchanges <= 2, s"expected <=2 Exchanges, got $exchanges:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"), plan)
  }

  test("forward as-of: earliest at-or-after, shared match, tolerance bound") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 08:00:00")), // -> e1 (first at-or-after)
      (2L, 10L, ts("2024-01-01 08:30:00")), // -> e1 too (shared, unconsumed)
      (3L, 10L, ts("2024-01-01 09:00:00")), // tie -> e1 (inclusive)
      (4L, 10L, ts("2024-01-01 09:15:00")), // -> e2
      (5L, 10L, ts("2024-01-01 11:00:00")), // nothing after -> null
      (6L, 20L, ts("2024-01-01 08:00:00"))  // keyless -> null
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 09:00:00"), 1.0), // e1
      (10L, ts("2024-01-01 09:30:00"), 2.0)  // e2
    ).toDF("e_user", "e_ts", "e_val")
    val out = graft.plans.AsOf
      .forward(left, right, "user_id", "e_user", "ts", "e_ts")
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[Timestamp]("e_ts"))).toMap
    assert(out(1L) == Some(ts("2024-01-01 09:00:00")))
    assert(out(2L) == Some(ts("2024-01-01 09:00:00")))
    assert(out(3L) == Some(ts("2024-01-01 09:00:00")))
    assert(out(4L) == Some(ts("2024-01-01 09:30:00")))
    assert(out(5L).isEmpty && out(6L).isEmpty)
    // 30-minute tolerance (micros): row 1 (gap 60 min) loses its match,
    // rows 2-4 (gaps 30/0/15 min) keep theirs
    val tol = graft.plans.AsOf
      .forward(left, right, "user_id", "e_user", "ts", "e_ts",
        tolerance = Some(30L * 60 * 1000000))
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[Timestamp]("e_ts"))).toMap
    assert(tol(1L).isEmpty)
    assert(tol(2L) == Some(ts("2024-01-01 09:00:00")))
    assert(tol(3L) == Some(ts("2024-01-01 09:00:00")))
    assert(tol(4L) == Some(ts("2024-01-01 09:30:00")))
  }

  test("backward tolerance: stale matches drop, fresh ones survive") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")), // gap 60 min -> dropped
      (2L, 10L, ts("2024-01-01 09:10:00"))  // gap 10 min -> kept
    ).toDF("event_id", "user_id", "ts")
    val right = Seq((10L, ts("2024-01-01 09:00:00"))).toDF("e_user", "e_ts")
    val out = AsOf.backward(left, right, "user_id", "e_user", "ts", "e_ts",
        tolerance = Some(30L * 60 * 1000000))
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[Timestamp]("e_ts"))).toMap
    assert(out(1L).isEmpty)
    assert(out(2L) == Some(ts("2024-01-01 09:00:00")))
  }

  test("left-only filters push below the as-of join and reach the scan") {
    val events = Tables.events(spark, dir)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val errors = events.filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("ts").as("e_ts"))
    val df = AsOf.backward(purchases, errors, "user_id", "e_user", "ts", "e_ts")
      .filter(col("event_id") < 500L && col("e_ts").isNotNull)
    val optimized = df.queryExecution.optimizedPlan.toString
    // the left-only conjunct sinks below the AsOfJoin node...
    assert("AsOfJoinPlan|asofjoinplan|AsOfJoin".r.findFirstIn(optimized).isDefined, optimized)
    assert(optimized.indexOf("event_id") > optimized.indexOf("AsOfJoin") ||
      !optimized.substring(0, optimized.indexOf("AsOfJoin")).contains("event_id#"),
      optimized)
    // ...and lands as a data-source pushed filter on the left parquet scan
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("LessThan(event_id,500)"), physical)
    // the right-side conjunct must NOT reach the right child (null-extension
    // semantics) — it stays as a post-join filter
    assert(!physical.contains("IsNotNull(e_ts)"), physical)
    // and semantics are unchanged vs the independent window formulation
    val window = graft.operators.Relational.lastErrorBeforePurchase(events)
      .where(col("event_id") < 500L && col("last_error_ts").isNotNull)
    assert(df.count() == window.count() && df.count() > 0)
  }

  test("null times: left nulls never match, right null times are skipped") {
    val left = Seq(
      (1L, 10L, Option(ts("2024-01-01 10:00:00"))),
      (2L, 10L, Option.empty[Timestamp])
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, Option(ts("2024-01-01 09:00:00"))),
      (10L, Option.empty[Timestamp])
    ).toDF("e_user", "e_ts")
    val out = AsOf.backward(left, right, "user_id", "e_user", "ts", "e_ts")
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[Timestamp]("e_ts"))).toMap
    assert(out(1L) == Some(ts("2024-01-01 09:00:00")))
    assert(out(2L).isEmpty)
  }
}
