package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.DeterministicAgg

/** Property: decimal-backed sums are partition-order independent — any
  * repartitioning produces the bit-identical double, equal to the serial
  * BigDecimal sum. (Plain double sums do NOT have this property; they are
  * what broke station_day_agg's oracle hash in round 1.) */
class DeterministicAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("exactSum is identical across partitionings and equals the serial decimal sum") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    (1 to 8).foreach { trial =>
      val xs = List.fill(50)(math.rint((rnd.nextDouble() * 2e6 - 1e6) * 1e6) / 1e6)
      val parts = 1 + rnd.nextInt(7)
      val expected = xs.map(x => BigDecimal(x).setScale(10, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
      val got = xs.toDF("x").repartition(parts)
        .agg(DeterministicAgg.exactSum(col("x"))).collect().head.getDouble(0)
      assert(got == expected, s"trial $trial parts $parts")
    }
  }

  test("avgRounded divides by non-null count") {
    import spark.implicits._
    val got = Seq(Some(1.0), None, Some(2.0)).toDF("x")
      .agg(DeterministicAgg.avgRounded(col("x"), 4)).collect().head.getDouble(0)
    assert(got == 1.5)
  }
}
