package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Skew, TripEtl}
import graft.sources.Tables

/** Hot-key handling: salted operators must be RESULT-identical to their
  * naive forms, and AQE's skew-join split must actually engage on a skewed
  * sort-merge join (so a conf/plan regression that silently disables it
  * fails here). */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** 200k-row fact where 95% of rows share key 7, joined to a 1000-row dim
    * — small enough for specs, skewed enough that one reducer would own
    * 190k rows. */
  private def skewedFixture = {
    val fact = spark.range(0, 200000).select(
      when(col("id") % 20 =!= 0, lit(7L)).otherwise(col("id") % 1000).as("k"),
      col("id").as("fact_id"))
    val dim = spark.range(0, 1000).select(
      col("id").as("k"), concat(lit("d"), col("id")).as("dname"))
    (fact, dim)
  }

  test("salted join is row-identical to the plain join on a skewed fixture") {
    val (fact, dim) = skewedFixture
    val naive = fact.join(dim, "k")
      .select("k", "fact_id", "dname").collect().map(_.toSeq).sortBy(_.toString)
    val salted = Skew.saltedJoin(fact, dim, key = "k", factIdCol = "fact_id")
      .select("k", "fact_id", "dname").collect().map(_.toSeq).sortBy(_.toString)
    assert(salted.length == naive.length)
    assert(salted.sameElements(naive))
    // the shuffle key really is (k, __salt): the hot key spreads across
    // reducers instead of landing on one
    val plan = Skew.saltedJoin(fact, dim, "k", "fact_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), plan)
  }

  test("salted two-phase aggregation equals the single-phase aggregate on testdata") {
    val dir = "/root/testdata/sf0.001"
    val enriched = TripEtl.enrichTrips(
      Tables.events(spark, dir), Tables.supplier(spark, dir))
    val plain = TripEtl.stationDayAgg(enriched)
      .collect().map(_.toSeq).sortBy(_.toString)
    val salted = Skew.saltedStationDayAgg(enriched)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(salted.length == plain.length && salted.sameElements(plain))
  }

  test("AQE splits the skewed sort-merge-join partition (skew=true in final plan)") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "100KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      val (fact, dim) = skewedFixture
      val joined = fact.join(dim, "k").select("k", "fact_id", "dname")
      // drive THIS plan instance (count()/write() spawn separate query
      // executions and the adaptive plan only finalizes once executed)
      val qe = joined.queryExecution
      assert(qe.executedPlan.execute().count() == 200000L)
      val plan = qe.executedPlan.toString
      assert(plan.contains("skew=true") || plan.contains("isSkewJoin=true"),
        s"AQE skew join did not engage:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
