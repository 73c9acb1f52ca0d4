package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (round-16): bisect the opqDistortion nondeterminism — run each
  * layer twice on the SimilaritySpec anisotropic fixture and diff. */
object NdProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 120L).map { i =>
      i -> (0 until 64).map(j =>
        (rnd.nextGaussian() * (if (j < 16) 8.0 else 1.0)).toFloat)
    }
    val fix = vecs.toDF("vec_id", "embedding")
    def diag(): Seq[(Int, Double)] =
      graft.operators.Similarity.covarianceMatrix(fix)
        .filter(col("i") === col("j"))
        .collect().map(r => (r.getAs[Int]("i"), r.getAs[Double]("cov")))
        .sortBy(_._1).toSeq
    val d1 = diag(); val d2 = diag()
    println("diag equal: " + (d1 == d2))
    if (d1 != d2) println(d1.zip(d2).filter(p => p._1 != p._2).take(5))
    val p1 = graft.operators.Similarity.opqPermutation(fix, 4).toSeq
    val p2 = graft.operators.Similarity.opqPermutation(fix, 4).toSeq
    println("perm equal: " + (p1 == p2))
    if (p1 != p2) { println(p1.mkString(",")); println(p2.mkString(",")) }
    def tot(perm: Array[Int]): Double =
      graft.operators.Similarity.pqDistortionUnder(fix, perm, 4)
        .collect().map(_.getAs[Double]("distortion")).sum
    val id = (0 until 64).toArray
    val t1 = tot(id); val t2 = tot(id)
    println(s"fixed-perm distortion equal: ${t1 == t2} ($t1 vs $t2)")
    // per-subspace codebooks, two runs, sequential slicing outside
    def cbs(): Seq[String] = (0 until 4).map { s =>
      val sliced = fix.select(col("vec_id"),
        slice(col("embedding"), s * 16 + 1, 16).as("embedding"))
      graft.operators.Similarity.kmeansCentroids(sliced, 8, 2)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
        .sortBy(x => (x._1, x._2)).mkString(";")
    }
    val c1 = cbs(); val c2 = cbs()
    (0 until 4).foreach { s =>
      println(s"subspace $s codebook equal: ${c1(s) == c2(s)}")
      if (c1(s) != c2(s)) {
        val a = c1(s).split(";"); val b = c2(s).split(";")
        a.zip(b).filter(p => p._1 != p._2).take(3).foreach(println)
      }
    }
    // now the same four kmeans calls CONCURRENTLY, twice
    def cbsPar(): Seq[String] = {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      val futs = (0 until 4).map { s =>
        scala.concurrent.Future {
          val sliced = fix.select(col("vec_id"),
            slice(col("embedding"), s * 16 + 1, 16).as("embedding"))
          graft.operators.Similarity.kmeansCentroids(sliced, 8, 2)
            .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
            .sortBy(x => (x._1, x._2)).mkString(";")
        }
      }
      val r = futs.map(f => scala.concurrent.Await.result(
        f, scala.concurrent.duration.Duration.Inf))
      pool.shutdown(); r
    }
    val pc1 = cbsPar(); val pc2 = cbsPar()
    (0 until 4).foreach { s =>
      println(s"PAR subspace $s: run1==seq ${pc1(s) == c1(s)}, run1==run2 ${pc1(s) == pc2(s)}")
      if (pc1(s) != c1(s)) {
        val a = pc1(s).split(";"); val b = c1(s).split(";")
        a.zip(b).filter(p => p._1 != p._2).take(3).foreach(println)
      }
    }
    // per-subspace distortion rows from the real operator, two runs
    def rows(): Seq[(Int, Long, Double)] =
      graft.operators.Similarity.pqDistortionUnder(fix, id, 4)
        .collect().map(r => (r.getAs[Int]("subspace"),
          r.getAs[Long]("n_vectors"), r.getAs[Double]("distortion")))
        .sortBy(_._1).toSeq
    val r1 = rows(); val r2 = rows()
    r1.zip(r2).foreach { case (a, b) =>
      println(s"subspace ${a._1}: $a vs $b  equal=${a == b}")
    }
    // permuted-style slicing (the operator's exact plan shape), kmeans only
    val permuted = fix.select(col("vec_id"),
      transform(typedLit(id.toSeq),
        p => element_at(col("embedding"), p + lit(1))).as("embedding"))
    def cbsPerm(): Seq[String] = {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      val futs = (0 until 4).map { s =>
        scala.concurrent.Future {
          val sliced = permuted.select(col("vec_id"),
            slice(col("embedding"), s * 16 + 1, 16).as("embedding"))
          graft.operators.Similarity.kmeansCentroids(sliced, 8, 2)
            .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
            .sortBy(x => (x._1, x._2)).mkString(";")
        }
      }
      val r = futs.map(f => scala.concurrent.Await.result(
        f, scala.concurrent.duration.Duration.Inf))
      pool.shutdown(); r
    }
    val q1 = cbsPerm(); val q2 = cbsPerm()
    (0 until 4).foreach { s =>
      println(s"PERM-PAR subspace $s: run1==run2 ${q1(s) == q2(s)}, ==raw ${q1(s) == c1(s)}")
    }
    spark.stop()
  }
}
