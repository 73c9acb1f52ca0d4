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
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = SparkEntry.entry(spark).count()
    println(s"SMOKE_ROWS=$n")
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
