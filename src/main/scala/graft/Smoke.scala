package graft
import org.apache.spark.sql.SparkSession

/** Dev replica of the driver's t1 smoke: build a session WITHOUT any
  * engine-specific config (the driver owns its own builder) and check the
  * flagship returns rows — proves Tables.events' runtime conf-set covers a
  * session that lacks the nanosAsLong flag. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // the declarative activation path for the engine's SQL functions
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = SparkEntry.entry(spark).count()
    println(s"SMOKE_ROWS=$n")

    // SQL surface: functions injected by GraftExtensions (config above),
    // exercised over real data
    graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .createOrReplaceTempView("documents")
    val sqlRows = spark.sql(
      """SELECT lang, count(DISTINCT graft_simhash(text)) AS n_hashes,
         graft_round_fixed4(avg(size(graft_tokens(text)))) AS avg_tokens
         FROM documents GROUP BY lang""").collect()
    println(s"SMOKE_SQL_ROWS=${sqlRows.length}")
    spark.stop()
    if (n <= 0 || sqlRows.isEmpty) sys.exit(1)
  }
}
