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

    // custom-operator surface: the native as-of join planned through the
    // extension-injected strategy (broadcast path at this SF)
    import org.apache.spark.sql.functions.col
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val asofRows = graft.plans.AsOf.backward(
        ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts")),
        ev.filter(col("event_type") === "error")
          .select(col("user_id").as("e_user"), col("ts").as("e_ts")),
        "user_id", "e_user", "ts", "e_ts")
      .filter(col("e_ts").isNotNull).count()
    println(s"SMOKE_ASOF_ROWS=$asofRows")
    spark.stop()
    if (n <= 0 || sqlRows.isEmpty || asofRows <= 0) sys.exit(1)
  }
}
