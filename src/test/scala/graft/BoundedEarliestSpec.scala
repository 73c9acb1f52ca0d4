package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BoundedEarliest

/** The bounded-buffer aggregator must agree with slice(sort_array(
  * collect_list)) on every input, under any partitioning — that is the
  * semantics it replaces with O(k) state. */
class BoundedEarliestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bounded aggregator == slice-of-sorted-collect on random data, any split") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    (1 to 5).foreach { trial =>
      val n = 1 + rnd.nextInt(40)
      val rows = List.fill(n)(
        ("g" + rnd.nextInt(3),
          new Timestamp(1700000000000L + rnd.nextInt(1000000) * 1000L)))
      val df = rows.toDF("g", "ts").repartition(1 + rnd.nextInt(5))
      val k = 1 + rnd.nextInt(6)

      val bounded = udaf(new BoundedEarliest(k), org.apache.spark.sql.Encoders.TIMESTAMP)
      val got = df.groupBy("g").agg(bounded(col("ts")).as("e"))
        .collect().map(r => r.getString(0) -> r.getSeq[Timestamp](1)).toMap
      val want = df.groupBy("g")
        .agg(slice(sort_array(collect_list(col("ts"))), 1, k).as("e"))
        .collect().map(r => r.getString(0) -> r.getSeq[Timestamp](1)).toMap
      assert(got == want, s"trial $trial k=$k")
    }
  }

  test("merge keeps only k earliest across partial buffers") {
    val agg = new BoundedEarliest(2)
    val t = (1 to 6).map(i => Timestamp.valueOf(s"2024-01-0$i 00:00:00"))
    val a = Seq(t(3), t(1)).foldLeft(agg.zero)(agg.reduce)
    val b = Seq(t(0), t(5), t(2)).foldLeft(agg.zero)(agg.reduce)
    assert(a.length == 2 && b.length == 2) // state never exceeds k
    assert(agg.finish(agg.merge(a, b)) == Seq(t(0), t(1)))
  }
}
