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

    // Last emission per (station, day) == batch result. "Last" is selected
    // WITHOUT scan-order ids (memory-sink row order across microbatch
    // partitions is not a contract): started/ended counts and max(trip_time)
    // are each monotone per key across update-mode emissions, so the
    // per-column max IS the final snapshot; and since every folded event
    // increments exactly one of the two counts, started+ended strictly
    // increases per emission, making it a deterministic max_by key for the
    // non-monotone avg.
    import org.apache.spark.sql.functions._
    val last = spark.table("stream_agg")
      .groupBy("station_name", "event_day")
      .agg(
        max(col("started_trips")).as("started_trips"),
        max(col("ended_trips")).as("ended_trips"),
        max_by(col("avg_temperature"),
          col("started_trips") + col("ended_trips")).as("avg_temperature"),
        max(col("update_time")).as("update_time"))
    val batch = TripEtl.stationDayAgg(
      TripEtl.enrichTrips(Tables.events(spark, dir), stations))
    val diff = last.exceptAll(batch).count() + batch.exceptAll(last).count()
    println(s"STREAM_ROWS=${last.count()} BATCH_ROWS=${batch.count()} STREAM_OK=${diff == 0}")

    // anomaly topology (anomalies-topic path) over the same staged stream
    val stream2 = StreamingEtl.readEventsStream(spark, staged.toString)
    val q2 = StreamingEtl
      .windowAnomaliesStreaming(TripEtl.enrichTrips(stream2, stations), 360, 50)
      .writeStream.format("memory").queryName("stream_anom")
      .outputMode("update").start()
    q2.processAllAvailable()
    q2.stop()
    val anomLast = spark.table("stream_anom")
      .groupBy("window_start", "station_name")
      .agg(max_by(col("is_anomaly"), col("returned_over_rented") +
        col("rented_over_returned")).as("is_anomaly"))
    val anomBatch = TripEtl.windowAnomalies(
      TripEtl.enrichTrips(Tables.events(spark, dir), stations), 360, 50)
    val nStream = anomLast.count()
    val nBatch = anomBatch.count()
    println(s"ANOM_STREAM_GROUPS=$nStream ANOM_BATCH_GROUPS=$nBatch ANOM_OK=${nStream == nBatch}")

    // exact-T2 full-snapshot punctuation (transformWithState/RocksDB) over
    // the same real staged stream: the boundary sweep's latest snapshot per
    // (station, day) must match the batch aggregate — ALL columns since
    // round 14: the typed buffer is decimal-exact and finish() lands on
    // the shared rounding grid, so arrival order cannot move the mean
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val stream3 = StreamingEtl.readEventsStream(spark, staged.toString)
    val trips3 = TripEtl.enrichTrips(stream3, stations)
      .select(col("station_name").as("stationName"),
        col("trip_time").as("tripTime"),
        col("trip_type").as("tripType"), col("temperature"))
      .as[graft.model.TripStation]
    val q3 = StreamingEtl.punctuatedFullSnapshotAggTws(trips3)
      .writeStream.format("memory").queryName("stream_snap")
      .outputMode("update").start()
    q3.processAllAvailable()
    q3.stop()
    // same monotone-column selection as above — no scan-order dependence
    val snapLast = spark.table("stream_snap")
      .groupBy(col("stationName").as("station_name"),
        col("eventDay").as("event_day"))
      .agg(
        max(col("startedTrips")).as("started_trips"),
        max(col("endedTrips")).as("ended_trips"),
        max_by(col("avgTemperature"),
          col("startedTrips") + col("endedTrips")).as("avg_temperature"),
        max(col("updateTime")).as("update_time"))
    val batchInts = batch.select("station_name", "event_day",
      "started_trips", "ended_trips", "avg_temperature", "update_time")
    val snapDiff = snapLast.exceptAll(batchInts).count() +
      batchInts.exceptAll(snapLast).count()
    println(s"SNAP_GROUPS=${snapLast.count()} SNAP_OK=${snapDiff == 0}")

    // streaming histogram sketch over the same real staged stream: the
    // maintained (type, bucket) counts must equal the batch histogram
    // computed on the batch-read events (additivity on real data, not just
    // the fixture spec)
    val stream4 = StreamingEtl.readEventsStream(spark, staged.toString)
    val q4 = StreamingEtl.valueHistogramStreaming(stream4, lo = 0.0, hi = 100.0)
      .writeStream.format("memory").queryName("stream_hist")
      .outputMode("update").start()
    q4.processAllAvailable()
    q4.stop()
    val histLast = spark.table("stream_hist")
      .groupBy("event_type", "bucket")
      .agg(max(col("cnt")).as("cnt")) // update-mode: counts are monotone
    val histBatch = StreamingEtl.valueHistogramStreaming(
      Tables.events(spark, dir), lo = 0.0, hi = 100.0)
    val histDiff = histLast.exceptAll(histBatch).count() +
      histBatch.exceptAll(histLast).count()
    println(s"HIST_GROUPS=${histLast.count()} HIST_OK=${histDiff == 0}")

    // tar-shard streaming ingest over real docs: pack the corpus into
    // shards, stream-read the directory through the DSv2 connector, and
    // require stream == batch on member count, total bytes, and the
    // order-independent content-hash XOR — the same invariants the
    // wds_roundtrip oracle pins, here guarding the STREAMING read path
    val wdsDirPath = java.nio.file.Files.createTempDirectory("graft-wds-smoke")
    val wdsDir = wdsDirPath.toString
    graft.sources.TarShards.writeShards(
      Tables.documents(spark, dir)
        .filter(col("text").isNotNull)
        .select(pmod(col("doc_id"), lit(4)).cast("int").as("shard_id"),
          concat(col("doc_id").cast("string"), lit(".txt")).as("name"),
          encode(col("text"), "UTF-8").as("content")),
      wdsDir, 4)
    def wdsSummary(df: org.apache.spark.sql.DataFrame) = df
      .agg(count(lit(1)).as("n"), sum(col("size")).as("bytes"),
        bit_xor(graft.operators.TextOps.portableHash64(col("content"))).as("x"))
    val wdsOk = try {
      val q5 = spark.readStream.format("graft-tar").load(wdsDir)
        .writeStream.format("memory").queryName("stream_wds")
        .outputMode("append").start()
      q5.processAllAvailable()
      q5.stop()
      val sRow = wdsSummary(spark.table("stream_wds")).head()
      val bRow = wdsSummary(spark.read.format("graft-tar").load(wdsDir)).head()
      val ok = sRow == bRow
      println(s"WDS_STREAM_MEMBERS=${sRow.getLong(0)} WDS_BATCH_MEMBERS=${bRow.getLong(0)} WDS_OK=$ok")
      ok
    } finally {
      // a standalone tool must clean its own packed corpus copy (and
      // close the walk stream — it holds a directory handle)
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(wdsDirPath)
      val paths = try walk.iterator().asScala.toSeq.sortBy(-_.getNameCount)
                  finally walk.close()
      paths.foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
    spark.stop()
    if (diff != 0 || nStream != nBatch || snapDiff != 0 || histDiff != 0 ||
        !wdsOk)
      sys.exit(1)
  }
}
