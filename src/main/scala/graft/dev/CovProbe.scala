package graft.dev

import org.apache.spark.sql.SparkSession

/** Dev probe (round-16 optimization): time covarianceMatrix's noop write in
  * isolation, with process-CPU per phase, to attribute the query's cpu-sec.
  * Not part of any driver contract. Usage: runMain graft.dev.CovProbe [sfDir]
  */
object CovProbe {
  private val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    .asInstanceOf[com.sun.management.OperatingSystemMXBean]
  private def cpu(): Double = osBean.getProcessCpuTime / 1e9

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def phase(name: String)(f: => Unit): Unit = {
      val c0 = cpu(); val t0 = System.nanoTime()
      f
      val w = (System.nanoTime() - t0) / 1e9
      println(f"$name%-28s wall=${w}%7.3f cpu=${cpu() - c0}%7.2f")
    }
    for (round <- 1 to 3) {
      println(s"--- round $round")
      phase("build plan") {
        graft.operators.Similarity.covarianceMatrix(
          graft.sources.Tables.embeddings(spark, dir)): Unit
      }
      phase("noop write") {
        graft.operators.Similarity.covarianceMatrix(
          graft.sources.Tables.embeddings(spark, dir))
          .write.format("noop").mode("overwrite").save()
      }
      phase("kernel-only count") {
        import spark.implicits._
        import org.apache.spark.sql.functions._
        val base = graft.sources.Tables.embeddings(spark, dir)
          .select(transform(col("embedding"), x => x.cast("double")).as("v"))
        val rows = base.repartition(spark.sparkContext.defaultParallelism)
        import graft.functions.DeterministicAgg.wideDecimalLocal
        val n = rows.as[Array[Double]].mapPartitions { it =>
          var acc = java.math.BigDecimal.ZERO
          var c = 0L
          while (it.hasNext) {
            val v = it.next()
            var i = 0
            while (i < v.length) {
              var j = i
              while (j < v.length) {
                acc = acc.add(wideDecimalLocal(v(i) * v(j))); j += 1
              }
              i += 1
            }
            c += 1
          }
          Iterator((c, acc.toPlainString))
        }.collect().map(_._1).sum
        println(s"    rows=$n")
      }
    }
    spark.stop()
  }
}
