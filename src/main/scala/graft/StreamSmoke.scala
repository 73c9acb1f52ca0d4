package graft

import org.apache.spark.sql.SparkSession

import graft.operators.TripEtl
import graft.sources.Tables
import graft.streaming.StreamingEtl

/** Dev smoke for the streaming path on real testdata: file-stream the events
  * parquet → broadcast-enrich → watermark + update-mode (station, day) agg →
  * memory sink, then check the final per-key state matches the batch
  * aggregate. Prints STREAM_OK=true/false. */
object StreamSmoke {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stations = Tables.supplier(spark, dir)
    // the file streaming source requires a directory — stage the single
    // parquet file into a temp dir (a real deployment streams a directory)
    val staged = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      staged.resolve("events.parquet"))
    val stream = StreamingEtl.readEventsStream(spark, staged.toString)
    val enriched = TripEtl.enrichTrips(stream, stations)
    val q = StreamingEtl.stationDayAggStreaming(enriched)
      .writeStream.format("memory").queryName("stream_agg")
      .outputMode("update").start()
    q.processAllAvailable()
    q.stop()

    // last emission per (station, day) == batch result
    import org.apache.spark.sql.functions._
    val last = spark.table("stream_agg")
      .withColumn("rn", monotonically_increasing_id())
      .groupBy("station_name", "event_day")
      .agg(
        max_by(col("started_trips"), col("rn")).as("started_trips"),
        max_by(col("ended_trips"), col("rn")).as("ended_trips"),
        max_by(col("avg_temperature"), col("rn")).as("avg_temperature"),
        max_by(col("update_time"), col("rn")).as("update_time"))
    val batch = TripEtl.stationDayAgg(
      TripEtl.enrichTrips(Tables.events(spark, dir), stations))
    val diff = last.exceptAll(batch).count() + batch.exceptAll(last).count()
    println(s"STREAM_ROWS=${last.count()} BATCH_ROWS=${batch.count()} STREAM_OK=${diff == 0}")
    spark.stop()
    if (diff != 0) sys.exit(1)
  }
}
