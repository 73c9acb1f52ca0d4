package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.concurrent.atomic.AtomicInteger

import scala.jdk.CollectionConverters._

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
  * are (corpus-sha, run-token)-keyed ([[Tables.scratchDir]]); the
  * per-run mutable surfaces (checkpoint, landing dir, sink) are wiped at
  * the start of every invocation — so repeated in-JVM runs (bench warmup
  * + 2 timed passes) restart the stream from a clean checkpoint instead
  * of resuming a stale one — while the STAGED corpus splits, a pure
  * function of the corpus, are built once per JVM and reused
  * ([[ensureStaged]], round-11 verdict #7). The staging cost was always
  * the harness's, not the stream's; now it is also paid once, not per
  * pass. */
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

  /** Staging reuse (round-11 verdict #7): the staged corpus copy is a
    * pure function of the input — [[Tables.scratchDir]] keys the base by
    * (corpus-sha, run-token), so within one JVM (bench warmup + timed
    * passes, or repeated driver queries) the staging is built ONCE and
    * only the per-run mutable surfaces (checkpoint, landing dir, sink)
    * reset per invocation. `stagingDirs` are checked for their parquet
    * `_SUCCESS` markers; any missing marker (first run, or a crashed
    * partial staging) rebuilds the whole set from clean. The multi-batch
    * guarantee is untouched: every invocation still replays ALL staged
    * splits through a fresh checkpoint. */
  private def ensureStaged(stagingDirs: Seq[String])(stage: => Unit): Unit = {
    val complete = stagingDirs.forall(d =>
      Files.exists(Paths.get(s"$d/_SUCCESS")))
    if (!complete) {
      stagingDirs.foreach(wipe)
      stage
      System.err.println(s"graft: staged ${stagingDirs.head} " +
        s"(+${stagingDirs.size - 1} more); later in-JVM runs reuse it")
    } else {
      System.err.println(s"graft: reusing staged ${stagingDirs.head}")
    }
  }

  /** The maintained d²-cell covariance grid, streamed: the corpus is
    * staged as 48 parquet splits, the file source replays them 16 per
    * micro-batch (three genuine micro-batches, not a single-batch
    * degenerate — with 16-way map parallelism inside each batch), the
    * update-mode memory sink
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
    // per-run surface resets; the staged splits persist across in-JVM runs
    wipe(s"$base/ckpt")
    // 48 staged files at 16 per trigger = the same 3 genuine
    // micro-batches as a 3-file staging, but each batch's heavy map side
    // (the d² pair explode + partial aggregate — the corpus-scale work)
    // reads 16 file splits in parallel instead of ONE: a 1-file batch
    // pinned ~2.7M exploded rows into a single task (measured 9-11 s
    // addBatch per batch at sf0.1, 25× the batch query's per-row cost;
    // 16-way drops it to ~1-2.7 s — the remaining floor is streaming
    // per-batch scheduling, not data)
    ensureStaged(Seq(s"$base/in")) {
      emb.select(col("vec_id"), col("embedding"))
        .repartition(48).write.mode("overwrite").parquet(s"$base/in")
    }
    val name = s"cov_stream_snap_${seq.incrementAndGet()}"
    // STATE-PARTITION SIZING: the stream's aggregate state is the FIXED
    // d² cell grid (4096 rows at d=64), so 32 state partitions would pay
    // 32 HDFS-state delta commits + fsyncs PER MICRO-BATCH to shard a
    // few thousand cells — measured as the dominant cost (~26 s/query at
    // sf0.1, ~4× the aggregate work). Four partitions carry ~1k cells
    // each; at any corpus size the grid is still d², so this is the
    // right sizing at 100 TB too, not a test shortcut.
    val ss = streamSession(spark, shufflePartitions = 4)
    val q = StreamingCovariance.covarianceStream(
        ss.readStream.schema(embSchema)
          .option("maxFilesPerTrigger", 16).parquet(s"$base/in"))
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", s"$base/ckpt")
      .outputMode("update").start()
    try q.processAllAvailable() finally q.stop()
    ss.table(name)
      .groupBy(col("i"), col("j"))
      .agg(max(struct(col("n_vectors"), col("cov"))).as("last"))
      .select(col("i"), col("j"),
        col("last.n_vectors").as("n_vectors"), col("last.cov").as("cov"))
  }

  /** A CLONED session for one streaming-snapshot run: shares the
    * SparkContext and every table/view of the parent but carries its OWN
    * SQLConf, so sizing `spark.sql.shuffle.partitions` to the stream's
    * bounded state never leaks into queries planned concurrently on the
    * caller's session (round-11 review). The memory-sink temp view also
    * registers in THIS session's catalog, so abandoning the clone after
    * the snapshot releases the accumulated emissions to GC instead of
    * piling one sink table per invocation into the shared catalog for
    * the JVM's lifetime (the lcpMemo evict-never lesson). The conf must
    * be set before .start() and NEVER restored mid-run: the partition
    * count is captured at FIRST micro-batch planning, on the stream
    * thread, after start() returns. */
  private def streamSession(spark: SparkSession,
                            shufflePartitions: Int): SparkSession = {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", shufflePartitions.toString)
    ss
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
    Seq("ckpt", "in", "cand", "tmp").foreach(d => wipe(s"$base/$d"))
    val chunks = 4
    // chunk bounds from the ACTUAL id range, not `n·c/chunks`: the
    // arithmetic form silently assumed dense ids [0, n) and DROPPED
    // every vector outside it on a strided corpus (caught by the 10×
    // scale replica, whose copies live at id + k·10⁶ — the streamed
    // graph there covered a tenth of the corpus). Range quarters cover
    // [min, max] for ANY id distribution; uneven chunk sizes are fine —
    // the ingest contract needs ascending disjoint ranges, not equal
    // ones — and an empty chunk just contributes no files to its batch.
    val mm = emb.agg(min(col("vec_id")), max(col("vec_id"))).head()
    val (idLo, idHi) =
      if (mm.isNullAt(0)) (0L, -1L) else (mm.getLong(0), mm.getLong(1))
    // bounds in BigInt: (span · c) wraps Long for spans past 2^63/chunks
    // (ids hashed into the full 63-bit space — exactly the non-dense-id
    // regime), inverting the ranges into silent emptiness; each final
    // bound is ≤ idHi + 1, so the narrowing back to Long is safe
    val bound = (c: Int) =>
      (BigInt(idLo) + (BigInt(idHi) - idLo + 1) * c / chunks).toLong
    ensureStaged((0 until chunks).map(c => s"$base/stage$c")) {
      (0 until chunks).foreach { c =>
        // ONE file per chunk: the landing move below must be atomic as a
        // UNIT — per-file moves of a multi-file chunk race the live file
        // source's listing (trigger polls run between renames), which can
        // split a chunk across micro-batches and trip the ingest-contract
        // check on a semantically correct ingest (round-11 review). A
        // single parquet file still READS with row-group parallelism, and
        // the stateful banding, not the chunk scan, is this stream's cost.
        emb.select(col("vec_id"), col("embedding"))
          .filter(col("vec_id") >= bound(c) && col("vec_id") < bound(c + 1))
          .coalesce(1)
          .write.mode("overwrite").parquet(s"$base/stage$c")
      }
    }
    // state-partition sizing as in covStreamSnapshot, on a cloned session:
    // the fMGWS state is bucket-grid-bounded, and 32 partitions × 4
    // batches would pay 128 state-delta commits plus 128 sink files for
    // a few thousand bucket groups (4 vs 8 A/B'd at sf0.1: a wash —
    // 3.58 vs 3.56 s; THIS stream's cost is the stateful banding compute,
    // which does use the map parallelism, so 8 stays)
    val ss = streamSession(spark, shufflePartitions = 8)
    val q = StreamingHnsw.candidateEdges(
        ss.readStream.schema(embSchema).parquet(s"$base/in"), bits = bits)
      .writeStream.format("parquet").option("path", s"$base/cand")
      .option("checkpointLocation", s"$base/ckpt")
      .outputMode("append").start()
    try {
      (0 until chunks).foreach { c =>
        val stage = Paths.get(s"$base/stage$c")
        val parts = {
          val ls = Files.list(stage) // close: leaks a directory fd otherwise
          try {
            ls.filter(_.getFileName.toString.startsWith("part-"))
              .iterator().asScala.toList
          } finally ls.close()
        }
        parts.foreach { p =>
          // copy → tmp → atomic move: the stage file must SURVIVE (it is
          // the reusable staging), and the landing itself must still be
          // atomic against the live source's listing — a direct copy
          // into in/ could be listed half-written
          val tmp = Paths.get(s"$base/tmp/stage$c-${p.getFileName}")
          Files.copy(p, tmp, StandardCopyOption.REPLACE_EXISTING)
          Files.move(tmp, Paths.get(s"$base/in/stage$c-${p.getFileName}"),
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

  /** The band-bucket dedup state maintained by a stream — the TEXT-side
    * member of the streaming-maintenance family (round-11 verdict #2:
    * dedup-against-a-growing-corpus is the streaming case a training-data
    * pipeline actually runs daily). The document corpus is staged as FOUR
    * ascending-doc_id range chunks (the ingest contract — new documents
    * get new, larger ids), each chunk MOVED atomically into the monitored
    * landing dir and drained before the next lands; per-(band, bucket)
    * member-set state emits candidate pairs as later documents collide
    * with earlier residents ([[StreamingMinhash.candidatePairs]] — fMGWS
    * with the high-water-mark contract check), candidates append to
    * a PARQUET sink, and the snapshot runs the batch path's own
    * exact-Jaccard verify tail — so `doc_minhash_pairs`' exact-recall
    * DuckDB oracle hashes the STREAMED dedup verbatim. */
  def minhashStreamPairs(spark: SparkSession, sfDir: String,
                         threshold: Double = 0.7): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val base = Tables.scratchDir("graft_mhstream", docs)
    Seq("ckpt", "in", "cand", "tmp").foreach(d => wipe(s"$base/$d"))
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType)))
    val chunks = 4
    // chunk bounds from the ACTUAL id range (the hnswStreamEdges lesson:
    // arithmetic n·c/chunks bounds silently drop strided ids), BigInt
    // intermediate so the span·c product cannot wrap
    val mm = docs.agg(min(col("doc_id")), max(col("doc_id"))).head()
    val (idLo, idHi) =
      if (mm.isNullAt(0)) (0L, -1L) else (mm.getLong(0), mm.getLong(1))
    val bound = (c: Int) =>
      (BigInt(idLo) + (BigInt(idHi) - idLo + 1) * c / chunks).toLong
    ensureStaged((0 until chunks).map(c => s"$base/stage$c")) {
      (0 until chunks).foreach { c =>
        // ONE file per chunk: the landing move must be atomic as a unit or
        // the live listing can split a chunk across micro-batches and trip
        // the ingest-contract check on a semantically correct ingest
        docs.select(col("doc_id"), col("text"))
          .filter(col("doc_id") >= bound(c) && col("doc_id") < bound(c + 1))
          .coalesce(1)
          .write.mode("overwrite").parquet(s"$base/stage$c")
      }
    }
    // cloned session + bounded state partitions (the covStreamSnapshot
    // sizing rule): the per-bucket member lists are small and the key
    // space shards fine over 4 partitions (A/B'd vs 8 at sf0.1:
    // 5.3 → 4.4 s — halving the per-batch state-delta commits, 16 for
    // the 4 batches, outweighs any map parallelism the bounded groups
    // could use); 32 would pay 128 commits for no benefit at all
    val ss = streamSession(spark, shufflePartitions = 4)
    val q = StreamingMinhash.candidatePairs(
        ss.readStream.schema(docSchema).parquet(s"$base/in"))
      .writeStream.format("parquet").option("path", s"$base/cand")
      .option("checkpointLocation", s"$base/ckpt")
      .outputMode("append").start()
    try {
      (0 until chunks).foreach { c =>
        val stage = Paths.get(s"$base/stage$c")
        val parts = {
          val ls = Files.list(stage)
          try {
            ls.filter(_.getFileName.toString.startsWith("part-"))
              .iterator().asScala.toList
          } finally ls.close()
        }
        parts.foreach { p =>
          // copy → tmp → atomic move: the stage file must SURVIVE (it is
          // the reusable staging), and the landing itself must still be
          // atomic against the live source's listing — a direct copy
          // into in/ could be listed half-written
          val tmp = Paths.get(s"$base/tmp/stage$c-${p.getFileName}")
          Files.copy(p, tmp, StandardCopyOption.REPLACE_EXISTING)
          Files.move(tmp, Paths.get(s"$base/in/stage$c-${p.getFileName}"),
            StandardCopyOption.ATOMIC_MOVE): Unit
        }
        q.processAllAvailable()
      }
    } finally q.stop()
    val candSchema = StructType(Seq(StructField("doc_a", LongType),
      StructField("doc_b", LongType)))
    StreamingMinhash.snapshotPairs(docs,
      spark.read.schema(candSchema).parquet(s"$base/cand"),
      threshold = threshold)
  }

  /** The Count-Min grid maintained by a stream — the third member of the
    * streaming-maintenance family (covariance moments, HNSW candidates,
    * CM counters): per-cell counts are classic mergeable state, so the
    * update-mode streaming aggregate over the SAME explode+hash pipeline
    * ([[graft.operators.Relational.countMinGrid]], shared code) converges
    * to the batch grid exactly; the snapshot takes the LATEST emission
    * per cell (`max(cnt)` — a cell's count is strictly monotone across
    * its re-emissions) and runs the batch probe/verify tail over it, so
    * `event_cm_counts`' DuckDB oracle hashes the streamed sketch
    * verbatim. Staging/trigger/state sizing follow [[covStreamSnapshot]]:
    * 24 splits at 8 per trigger (3 genuine micro-batches, parallel map
    * side), 4 state partitions for a ≤ depth·width-cell grid. */
  def cmStreamCounts(spark: SparkSession, sfDir: String,
                     depth: Int = 4, width: Int = 256): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val base = Tables.scratchDir("graft_cmstream", ev)
    wipe(s"$base/ckpt")
    ensureStaged(Seq(s"$base/in")) {
      ev.select(col("user_id"))
        .repartition(24).write.mode("overwrite").parquet(s"$base/in")
    }
    val name = s"cm_stream_snap_${seq.incrementAndGet()}"
    val userSchema = StructType(Seq(StructField("user_id", LongType)))
    val ss = streamSession(spark, shufflePartitions = 4)
    val q = graft.operators.Relational.countMinGrid(
        ss.readStream.schema(userSchema)
          .option("maxFilesPerTrigger", 8).parquet(s"$base/in"),
        depth, width)
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", s"$base/ckpt")
      .outputMode("update").start()
    try q.processAllAvailable() finally q.stop()
    val grid = ss.table(name)
      .groupBy(col("r"), col("c")).agg(max(col("cnt")).as("cnt"))
    // the estimate tail runs entirely on the clone too — mixing
    // DataFrames from two sessions in one plan is unsupported; the tiny
    // output (20 rows) is session-agnostic for the consumer
    graft.operators.Relational.countMinEstimates(
      Tables.events(ss, sfDir), grid, depth, width,
      probeLo = 0L, probeHi = 19L)
  }

  /** The HyperLogLog register table maintained by a stream — the sixth
    * member of the streaming-maintenance family (covariance moments,
    * HNSW candidates, MinHash band buckets, CM counters, station aggs),
    * and the one with the STRONGEST merge algebra: register maxima are
    * idempotent as well as associative/commutative, so late or replayed
    * arrivals are free, not just mergeable. The update-mode streaming
    * aggregate runs the SAME hash/rho projection as the batch sketch
    * ([[graft.operators.Relational.hllRegisters]], shared code) and
    * therefore converges to the batch register table exactly; the
    * snapshot takes the LATEST emission per (type, register) (`max(r)` —
    * a register is monotone across its re-emissions) and feeds the batch
    * estimate tail, so `event_type_hll_users`' DuckDB oracle hashes the
    * streamed sketch verbatim. Staging/trigger/state sizing follow
    * [[cmStreamCounts]]: 24 splits at 8 per trigger (3 genuine
    * micro-batches with a parallel map side), 4 state partitions for a
    * ≤ groups·m-register table — state is sketch-bounded, never
    * corpus-bounded, at any SF. */
  def hllStreamUsers(spark: SparkSession, sfDir: String,
                     p: Int = 8): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val base = Tables.scratchDir("graft_hllstream", ev)
    wipe(s"$base/ckpt")
    ensureStaged(Seq(s"$base/in")) {
      ev.select(col("event_type"), col("user_id"))
        .repartition(24).write.mode("overwrite").parquet(s"$base/in")
    }
    val name = s"hll_stream_snap_${seq.incrementAndGet()}"
    val evSchema = StructType(Seq(
      StructField("event_type", StringType),
      StructField("user_id", LongType)))
    val ss = streamSession(spark, shufflePartitions = 4)
    val q = graft.operators.Relational.hllRegisters(
        ss.readStream.schema(evSchema)
          .option("maxFilesPerTrigger", 8).parquet(s"$base/in"), p)
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", s"$base/ckpt")
      .outputMode("update").start()
    try q.processAllAvailable() finally q.stop()
    val regs = ss.table(name)
      .groupBy(col("event_type"), col("reg")).agg(max(col("r")).as("r"))
    graft.operators.Relational.hllEstimateTail(regs, p)
  }
}
