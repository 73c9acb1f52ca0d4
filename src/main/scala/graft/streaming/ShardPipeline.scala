package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sources.TarShards

/** End-to-end streaming RE-SHARD pipeline: tar shards in → exact content
  * dedup → tar shards out. The standing job a training-data platform runs
  * as upstream crawlers drop new shards into a landing directory:
  *
  *   landing dir (.tar) ──readStream──▶ dedup(content) ──foreachBatch──▶
  *     curated/batch-<id>/shard-NNNNN.tar
  *
  * Design notes, each load-bearing at scale:
  *  - The SOURCE is the [[graft.sources.TarDataSource]] micro-batch
  *    stream: the offset is the shard-file set, so each landed shard is
  *    processed exactly once across restarts.
  *  - Dedup is `dropDuplicates` on the content hash — streaming state is
  *    one 32-byte digest per DISTINCT document ever seen (not per row),
  *    the same unbounded-but-distinct-bounded state contract as the
  *    batch incremental dedup's bloom path; swap in
  *    `dropDuplicatesWithinWatermark` when documents carry event time
  *    and late duplicates have a horizon.
  *  - The SINK is `foreachBatch` → [[TarShards.writeShards]] into a
  *    PER-BATCH directory: writeShards owns one directory per call
  *    (delete + rewrite), so batch isolation makes the sink idempotent —
  *    a replayed batch id rewrites its own directory and nothing else,
  *    which combined with the source's exactly-once offsets gives
  *    end-to-end exactly-once output.
  *  - Shard ids re-key by content hash, so output shards are balanced
  *    regardless of how lumpy the landed shards were.
  */
object ShardPipeline {

  /** Start the pipeline; caller owns the returned query's lifecycle. */
  def reshardDeduped(spark: SparkSession, landingDir: String, outDir: String,
                     checkpointDir: String, nShards: Int): StreamingQuery =
    spark.readStream
      .format("graft.sources.TarDataSource")
      .load(landingDir)
      .select(col("name"), col("content"),
        sha2(col("content"), 256).as("content_hash"))
      .dropDuplicates("content_hash")
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // persist: the emptiness probe and the shard write would otherwise
        // each re-read every landed tar and re-run the dedup state lookup
        batch.persist()
        try {
          if (!batch.isEmpty) {
            TarShards.writeShards(
              batch.select(
                pmod(abs(xxhash64(col("content_hash"))), lit(nShards))
                  .cast("int").as("shard_id"),
                col("name"), col("content")),
              s"$outDir/batch-$batchId", nShards)
          }
        } finally batch.unpersist()
      }
      .start()
}
