package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational
import graft.sources.Tables

class RelationalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("approx_count_distinct stays within 5% of the exact distinct count") {
    val events = Tables.events(spark, dir)
    val approx = Relational.eventTypeApproxUsers(events)
      .collect().map(r => r.getAs[String]("event_type") -> r.getAs[Long]("approx_users")).toMap
    val exact = events.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("u"))
      .collect().map(r => r.getAs[String]("event_type") -> r.getAs[Long]("u")).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, e) =>
      assert(math.abs(approx(k) - e).toDouble / e <= 0.05, s"$k approx=${approx(k)} exact=$e")
    }
  }

  test("rollup emits leaf, subtotal, and grand-total rows") {
    val out = Relational.pricingRollup(Tables.lineitem(spark, dir)).collect()
    val grand = out.filter(r => r.isNullAt(0) && r.isNullAt(1))
    val subtotals = out.filter(r => !r.isNullAt(0) && r.isNullAt(1))
    val leaves = out.filter(r => !r.isNullAt(0) && !r.isNullAt(1))
    assert(grand.length == 1)
    assert(subtotals.nonEmpty && leaves.nonEmpty)
    // subtotals reconcile with leaves
    assert(grand.head.getAs[Long]("n_items") ==
      leaves.map(_.getAs[Long]("n_items")).sum)
  }

  test("purchasers_without_errors plans exactly one shuffle") {
    val plan = Relational.purchasersWithoutErrors(Tables.events(spark, dir))
      .queryExecution.executedPlan.toString
    // one Exchange for the groupBy; the orderBy adds a range exchange —
    // but NOT the three shuffles of distinct+distinct+except
    assert("Exchange".r.findAllIn(plan).length <= 2, plan)
  }
}
