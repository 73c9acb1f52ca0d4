package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main — one JSON line on stdout per the driver contract.
  *
  * Honesty rules (round-1 verdict): a failing query is recorded as an error
  * and fails the whole run (nonzero exit); evaluation forces the full plan
  * through the `noop` sink (a `count()` would let column pruning delete most
  * of the measured work, e.g. JSON parsing); each query gets one warmup pass
  * and the MINIMUM of the next two runs is reported (round-4 verdict: single
  * timed runs showed ±15-70% host-load noise — min-of-2 is the same
  * estimator tools/scale_slope.py already uses), so JVM/codegen/
  * parquet-footer warmup and transient host load aren't billed to whichever
  * query they happen to hit.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // events.ts is parquet TIMESTAMP(NANOS) — see Tables.events
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // dev-only subsetting (e.g. the scale-slope tool benches just the
    // documents/embeddings queries): comma-separated name prefixes; the
    // driver leaves it unset and always benches everything
    val prefixes = sys.env.get("SPARK_GRAFT_QUERIES").map(_.split(",").toSeq)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => prefixes.forall(_.exists(n.startsWith)))
    val timed = scala.collection.mutable.LinkedHashMap[String, Double]()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    names.foreach { name =>
      try {
        runOnce(name) // warmup
        timed(name) = math.min(runOnce(name), runOnce(name))
      } catch {
        case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
            .replaceAll("[\"\\\\\\n\\r\\t]", " ").take(200)
      }
    }
    val qs = timed.map { case (k, v) => s""""$k":${"%.3f".format(v)}""" }
      .mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => s""""$k":"$v"""" }
      .mkString("{", ",", "}")
    val total = timed.values.sum
    val line =
      s"""{"metric":"total","value":${"%.3f".format(total)},"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}"""
    // sbt forks this main (run / fork := true) and by default captures the
    // child's stdout into its [info] logger, which is why BENCH_r0*.json had
    // parsed:null three rounds running — build.sbt now sets
    // `run / outputStrategy := StdoutOutput` so this line reaches the
    // driver's scraper unwrapped; bench.json stays as the file channel.
    println(line)
    java.nio.file.Files.writeString(java.nio.file.Paths.get("bench.json"), line)
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
