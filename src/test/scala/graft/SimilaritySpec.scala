package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity
import graft.sources.Tables

/** ANN quality: the approximate paths must actually approximate — recall is
  * measured against the exact brute-force result on real testdata. */
class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")

  private def topkSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet

  test("IVF top-k recall vs brute force is >= 0.6 at nprobe=4/16") {
    val exact = topkSet(Similarity.bruteForceTopK(emb, numQueries = 10, k = 5))
    val approx = topkSet(Similarity.ivfTopK(emb, numQueries = 10, k = 5, c = 16, nprobe = 4))
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"IVF recall $recall")
  }

  test("brute-force plan broadcasts the query side (no corpus shuffle)") {
    val plan = Similarity.bruteForceTopK(emb, 10, 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("LSH pair finding reports only pairs above threshold, verified exactly") {
    val pairs = Similarity.lshNearDupPairs(emb, threshold = 0.3).collect()
    assert(pairs.forall(_.getAs[Double]("cosine") >= 0.3))
    // candidates come from bucket equi-joins, not a cross join
    val plan = Similarity.lshNearDupPairs(emb, threshold = 0.3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }

  test("cosine of a vector with itself is 1") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1L, Seq(1.0f, 2.0f, 3.0f))).toDF("vec_id", "embedding")
    val v = transform(col("embedding"), x => x.cast("double"))
    val c = df.select(Similarity.cosine(v, v).as("c")).collect().head.getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
  }
}
