package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Storage-layout evidence for the 100 TB story: bucketed tables make the
  * repeated big–big equi-join shuffle-FREE (the co-location the brief's
  * "pre-partitioning" rule asks for). Partition pruning is covered in
  * TablesSpec. */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("bucketed tables join with zero Exchange (co-located sort-merge join)") {
    import spark.implicits._
    val conf = spark.conf
    val savedThreshold = conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    val wh = java.nio.file.Files.createTempDirectory("graft-buckets")
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the SMJ path
      // both sides bucketed AND sorted on the join key into 8 buckets:
      // the join then reads bucket i against bucket i — no Exchange, no
      // extra Sort, the exact layout a nightly 100 TB fact⋈fact job
      // amortizes over every downstream run
      Tables.orders(spark, dir).write
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .option("path", s"$wh/orders_b").mode("overwrite").saveAsTable("orders_b")
      Tables.customer(spark, dir).write
        .bucketBy(8, "c_custkey").sortBy("c_custkey")
        .option("path", s"$wh/customer_b").mode("overwrite").saveAsTable("customer_b")

      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"), $"o_custkey" === $"c_custkey")
        .select($"o_orderkey", $"c_name")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("SortMergeJoin"), plan)
      // and it computes the same thing as the plain join
      val expect = Tables.orders(spark, dir)
        .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
        .count()
      assert(joined.count() == expect)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
      savedThreshold match {
        case Some(v) => conf.set("spark.sql.autoBroadcastJoinThreshold", v)
        case None => conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    }
  }
}
