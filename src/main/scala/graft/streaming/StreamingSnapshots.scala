package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Similarity
import graft.sources.Tables

/** DRIVER-CHECKABLE streaming snapshots (round-10 verdict #1): the two
  * round-10 streaming components — [[StreamingCovariance]] and
  * [[StreamingHnsw]] — are each proven equal to their batch twin by an
  * sbt spec; these entry points run the REAL streaming path end to end
  * inside a driver query and emit the batch-shaped result, so the
  * existing batch oracles (`emb_covariance`, `emb_hnsw_build`) hash the
  * STREAMED artifact directly. That converts "trust the spec" into
  * "driver-checked" without inventing new oracle artifacts.
  *
  * Both queries ingest through Structured Streaming's FILE source over a
  * scratch staging of the corpus — no MemoryStream, hence NO driver-side
  * collect of the corpus anywhere: the stream reads parquet splits
  * exactly like a 100 TB ingest tails a landing directory. Scratch dirs
  * are (corpus-sha, run-token)-keyed ([[Tables.scratchDir]]) and wiped
  * at the start of every invocation, so repeated in-JVM runs (bench
  * warmup + 2 timed passes) restart the stream from a clean checkpoint
  * instead of resuming a stale one. */
object StreamingSnapshots {

  private val seq = new AtomicInteger(0)

  private val embSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  private def wipe(dir: String): Unit = {
    def rm(f: java.io.File): Unit = {
      val kids = f.listFiles()
      if (kids != null) kids.foreach(rm)
      f.delete(): Unit
    }
    rm(new java.io.File(dir))
    Files.createDirectories(Paths.get(dir)): Unit
  }

  /** The maintained d²-cell covariance grid, streamed: the corpus is
    * staged as THREE parquet splits, the file source replays them one
    * per micro-batch (`maxFilesPerTrigger 1` — a genuine multi-batch
    * ingest, not a single-batch degenerate), the update-mode memory sink
    * records every refreshed cell emission, and the snapshot is the
    * LATEST emission per cell — selected declaratively by max-struct on
    * `n_vectors`, which strictly increases per re-emission because every
    * vector touches every cell. Output schema and values are
    * [[graft.operators.Similarity.covarianceMatrix]]'s (cell-for-cell
    * equality is the moments-are-mergeable algebra; spec-pinned in
    * StreamingEtlSpec), so `emb_covariance`'s DuckDB oracle applies
    * verbatim. */
  def covStreamSnapshot(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val base = Tables.scratchDir("graft_covstream", emb)
    wipe(base)
    emb.select(col("vec_id"), col("embedding"))
      .repartition(3).write.mode("overwrite").parquet(s"$base/in")
    val name = s"cov_stream_snap_${seq.incrementAndGet()}"
    val q = StreamingCovariance.covarianceStream(
        spark.readStream.schema(embSchema)
          .option("maxFilesPerTrigger", 1).parquet(s"$base/in"))
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", s"$base/ckpt")
      .outputMode("update").start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
      .groupBy(col("i"), col("j"))
      .agg(max(struct(col("n_vectors"), col("cov"))).as("last"))
      .select(col("i"), col("j"),
        col("last.n_vectors").as("n_vectors"), col("last.cov").as("cov"))
  }

  /** The incrementally built HNSW graph, streamed: the corpus is staged
    * as FOUR ascending-vec_id range chunks (the ingest contract — new
    * corpus additions get new, larger ids), each chunk is MOVED into the
    * monitored landing dir and drained before the next lands, so the
    * stateful bucket-cap state sees the contract order across
    * micro-batches (and [[StreamingHnsw.candidateEdges]] now fails
    * loudly if it didn't). Candidate edges append to a PARQUET file sink
    * — the accumulated log never touches the driver — and the snapshot
    * re-ranks it with the batch build's own shared tail. Output is
    * edge-for-edge [[graft.operators.Similarity.hnswBuild]] (spec-pinned
    * in StreamingEtlSpec), so `emb_hnsw_build`'s closed-form graph
    * oracle applies verbatim. */
  def hnswStreamEdges(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val n = Tables.parquetRowCount(spark, sfDir, "embeddings")
    val bits = Similarity.autoBits(n)
    val base = Tables.scratchDir("graft_hnswstream", emb)
    wipe(base)
    val chunks = 4
    val bound = (c: Int) => n * c / chunks
    (0 until chunks).foreach { c =>
      emb.select(col("vec_id"), col("embedding"))
        .filter(col("vec_id") >= bound(c) && col("vec_id") < bound(c + 1))
        .write.mode("overwrite").parquet(s"$base/stage$c")
    }
    Files.createDirectories(Paths.get(s"$base/in"))
    val q = StreamingHnsw.candidateEdges(
        spark.readStream.schema(embSchema).parquet(s"$base/in"), bits = bits)
      .writeStream.format("parquet").option("path", s"$base/cand")
      .option("checkpointLocation", s"$base/ckpt")
      .outputMode("append").start()
    try {
      (0 until chunks).foreach { c =>
        val stage = Paths.get(s"$base/stage$c")
        Files.list(stage).filter(_.getFileName.toString.startsWith("part-"))
          .forEach { (p: Path) =>
            Files.move(p, Paths.get(s"$base/in/stage$c-${p.getFileName}"),
              StandardCopyOption.ATOMIC_MOVE): Unit
          }
        q.processAllAvailable()
      }
    } finally q.stop()
    val candSchema = StructType(Seq(StructField("level", IntegerType),
      StructField("src", LongType), StructField("dst", LongType)))
    StreamingHnsw.snapshotEdges(emb,
      spark.read.schema(candSchema).parquet(s"$base/cand"))
  }
}
