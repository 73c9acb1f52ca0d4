package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.concurrent.atomic.AtomicInteger

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
    try {
      q.processAllAvailable()
      requireMultiBatch(q, 2) // maxFilesPerTrigger makes the run multi-batch
    } finally q.stop()
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
    // A gate runs for seconds; the background state-store maintenance
    // thread (default interval 60s) only contends with it — a snapshot
    // upload can hold a provider's lock mid-micro-batch, which showed up
    // as rare multi-second stalls in the round-15 cold-run bench samples.
    // Pushing the interval past any gate's lifetime removes that source;
    // a long-running production stream keeps the default (this conf is on
    // the gate's cloned session only, never the user's).
    ss.conf.set("spark.sql.streaming.stateStore.maintenanceInterval", "3600s")
    // requireMultiBatch counts data batches via q.recentProgress, which is
    // capped by this conf (default 100) — a landing loop longer than the
    // cap would undercount and spuriously fail (round-15 advisor). No
    // current gate approaches 100 batches; the raised cap makes the
    // assertion correct by construction rather than by coincidence.
    ss.conf.set("spark.sql.streaming.numRecentProgressUpdates", "1000")
    ss
  }

  /** Land one staged chunk's files into a live landing dir: copy each
    * file to the run's tmp dir, then ATOMIC-move into `inDir`. The stage
    * file must SURVIVE (it is the reusable staging), and the landing
    * itself must be atomic against the live source's listing — a direct
    * copy into the landing dir could be listed half-written (trigger
    * polls run between renames). `prefix` keeps per-chunk names unique
    * across landings. */
  private def landChunk(stageDir: String, tmpDir: String, inDir: String,
                        prefix: String,
                        fileFilter: String => Boolean =
                          _.startsWith("part-")): Unit = {
    val stage = Paths.get(stageDir)
    val parts = {
      val ls = Files.list(stage) // close: leaks a directory fd otherwise
      try {
        ls.filter(p => fileFilter(p.getFileName.toString))
          .iterator().asScala.toList
      } finally ls.close()
    }
    parts.foreach { p =>
      val tmp = Paths.get(s"$tmpDir/$prefix-${p.getFileName}")
      Files.copy(p, tmp, StandardCopyOption.REPLACE_EXISTING)
      Files.move(tmp, Paths.get(s"$inDir/$prefix-${p.getFileName}"),
        StandardCopyOption.ATOMIC_MOVE): Unit
    }
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
    val (emb, bits, base, chunks) = hnswStaged(spark, sfDir)
    Seq("ckpt", "in", "cand", "tmp").foreach(d => wipe(s"$base/$d"))
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
        landChunk(s"$base/stage$c", s"$base/tmp", s"$base/in", s"stage$c")
        q.processAllAvailable()
      }
      requireMultiBatch(q, 2) // cross-batch state must be genuinely probed
    } finally q.stop()
    val candSchema = StructType(Seq(StructField("level", IntegerType),
      StructField("src", LongType), StructField("dst", LongType)))
    StreamingHnsw.snapshotEdges(emb,
      spark.read.schema(candSchema).parquet(s"$base/cand"))
  }

  /** Shared staging for the streamed-HNSW gates: the corpus as FOUR
    * ascending-vec_id range chunks under one (corpus, run)-keyed base —
    * the uninterrupted gate and the restart twin drain the same staged
    * files through their own landing dirs/checkpoints. Returns
    * (embeddings, autoBits, scratch base, chunk count). */
  private def hnswStaged(spark: SparkSession,
                         sfDir: String): (DataFrame, Int, String, Int) = {
    val emb = Tables.embeddings(spark, sfDir)
    val n = Tables.parquetRowCount(spark, sfDir, "embeddings")
    val bits = Similarity.autoBits(n)
    val base = Tables.scratchDir("graft_hnswstream", emb)
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
    (emb, bits, base, chunks)
  }

  /** CHECKPOINT-RECOVERY for the streamed HNSW ingest (round-15 verdict
    * #3) — a third recovered state SHAPE: [[stationDayAggStreamRestart]]
    * recovers a windowed aggregation, [[asOfStreamLastErrorRestart]]
    * recovers ListState+timers under RocksDB; this gate recovers the
    * flatMapGroupsWithState BUCKET-MEMBERSHIP grid (per-(level, table,
    * bucket) admitted-member lists + high-water marks) that the
    * incremental graph build's cap semantics depend on. The first query
    * ingests chunk 0 and is stopped; the checkpoint is TORN (newest
    * commit-log entry deleted, offsets kept) so the restarted query must
    * RE-EXECUTE the uncommitted batch against the recovered state — and
    * here the ingest contract itself polices the recovery: replay loads
    * the state version from BEFORE the torn batch, so the high-water
    * marks sit below the replayed ids; a state store that instead served
    * the post-batch version would fail the gate loudly (replayed ids ≤
    * recovered high-water mark trips [[StreamingHnsw.candidateEdges]]'s
    * IllegalStateException), and lost bucket members would admit a
    * different member set than the batch cap — wrong edges, hash fail.
    * Remaining chunks land post-restart; oracle = `emb_hnsw_build`'s
    * closed-form graph oracle VERBATIM, as the uninterrupted twin. */
  def hnswStreamEdgesRestart(spark: SparkSession, sfDir: String): DataFrame = {
    val (emb, bits, base, chunks) = hnswStaged(spark, sfDir)
    Seq("rckpt", "rin", "rcand", "rtmp").foreach(d => wipe(s"$base/$d"))
    val ss = streamSession(spark, shufflePartitions = 8)
    def start() = StreamingHnsw.candidateEdges(
        ss.readStream.schema(embSchema).parquet(s"$base/rin"), bits = bits)
      .writeStream.format("parquet").option("path", s"$base/rcand")
      .option("checkpointLocation", s"$base/rckpt")
      .outputMode("append").start()
    val q1 = start()
    try {
      landChunk(s"$base/stage0", s"$base/rtmp", s"$base/rin", "stage0")
      q1.processAllAvailable()
      requireMultiBatch(q1, 1)
    } finally q1.stop() // bucket state + offsets stay in rckpt
    val torn = tearNewestCommit(s"$base/rckpt")
    val t0 = System.nanoTime()
    val q2 = start()
    try {
      // isolated restart price (state reload + replayed batch) — see
      // stationDayAggStreamRestart's decomposition note
      q2.processAllAvailable()
      System.err.println("graft: hnswStreamEdgesRestart reload+replay " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s")
      (1 until chunks).foreach { c =>
        landChunk(s"$base/stage$c", s"$base/rtmp", s"$base/rin", s"stage$c")
        q2.processAllAvailable()
      }
      requireReplayed(q2, torn)         // the torn batch really re-executed
      requireMultiBatch(q2, chunks - 1) // post-restart chunks
    } finally q2.stop()
    val candSchema = StructType(Seq(StructField("level", IntegerType),
      StructField("src", LongType), StructField("dst", LongType)))
    StreamingHnsw.snapshotEdges(emb,
      spark.read.schema(candSchema).parquet(s"$base/rcand"))
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
        landChunk(s"$base/stage$c", s"$base/tmp", s"$base/in", s"stage$c")
        q.processAllAvailable()
      }
      requireMultiBatch(q, 2) // cross-batch state must be genuinely probed
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
    try {
      q.processAllAvailable()
      requireMultiBatch(q, 2) // maxFilesPerTrigger makes the run multi-batch
    } finally q.stop()
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
    try {
      q.processAllAvailable()
      requireMultiBatch(q, 2) // maxFilesPerTrigger makes the run multi-batch
    } finally q.stop()
    val regs = ss.table(name)
      .groupBy(col("event_type"), col("reg")).agg(max(col("r")).as("r"))
    graft.operators.Relational.hllEstimateTail(regs, p)
  }

  /** Number of ascending event-time DATA chunks the trip-stream staging
    * lands (sentinel excluded). TWO is the round-15 chunk-lever trim
    * (verdict #2, down from four): the multi-batch PROOF needs state to
    * span at least two data micro-batches before the sentinel — two chunks
    * give exactly that (and [[requireMultiBatch]] now asserts it on every
    * run) — while each extra landing only re-paid the per-micro-batch
    * scheduling fixed cost on the same total rows. A/B at sf0.1: identical
    * oracle rows, family wall down (PLANS.md round-15 notes). */
  private val tripChunks = 2

  /** Makes a stopped stream's checkpoint TORN: deletes the newest
    * commit-log entry while leaving its offsets entry (and the sink
    * manifest, and any state-store versions) in place — the exact
    * artifact set a crash between sink commit and commit-log write
    * leaves. The next query on this checkpoint must re-execute that
    * batch and rely on sink idempotency for exactly-once. Fails loudly
    * if the checkpoint has no committed batch to tear (the gate's
    * pre-restart leg must have processed data for the replay proof to
    * mean anything). Returns the torn batch id so the caller can assert
    * the restarted query really re-executed it — the newest batch may be
    * a no-data watermark-advance batch, so a data-batch COUNT cannot
    * prove the replay happened, but the batchId in the progress record
    * can. */
  private def tearNewestCommit(ckptDir: String): Long = {
    val commits = new java.io.File(s"$ckptDir/commits")
    val batches = Option(commits.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.forall(_.isDigit))
    require(batches.nonEmpty,
      s"restart gate: no committed batch in $ckptDir to tear — " +
        "the pre-crash leg processed nothing")
    val newest = batches.maxBy(_.getName.toLong)
    require(newest.delete(),
      s"restart gate: could not tear commit ${newest.getName}")
    // Hadoop's checksummed local FS keeps a `.N.crc` sidecar per commit
    // file; leaving it behind makes the replayed batch's commit REWRITE
    // collide (FileAlreadyExistsException on the .crc rename, surfacing
    // as a bogus "multiple queries on one checkpoint") — a real crash
    // between sink commit and commit write never created the sidecar in
    // the first place, so tearing must remove both
    val crc = new java.io.File(commits, s".${newest.getName}.crc")
    if (crc.exists) require(crc.delete(),
      s"restart gate: could not tear commit sidecar ${crc.getName}")
    newest.getName.toLong
  }

  /** Asserts the restarted query re-executed the torn batch: its FIRST
    * executed batch id must be exactly the one whose commit was deleted
    * (not the next one — that would mean the uncommitted batch was
    * skipped, i.e. data loss under the exactly-once contract). */
  private def requireReplayed(q: org.apache.spark.sql.streaming.StreamingQuery,
                              tornBatchId: Long): Unit = {
    val ids = q.recentProgress.map(_.batchId)
    require(ids.nonEmpty && ids.min == tornBatchId,
      s"restart gate: expected the restarted query to replay torn batch " +
        s"$tornBatchId, but its executed batch ids start at " +
        s"${if (ids.isEmpty) "<none>" else ids.min.toString}")
  }

  /** Asserts the finished stream actually executed at least `minDataBatches`
    * micro-batches WITH input rows (the chunk-lever invariant, round-15
    * verdict #2): cross-batch state is only proven if the run was genuinely
    * multi-batch, so every snapshot checks its query's progress record
    * before stopping instead of trusting the landing loop's shape. Call
    * BEFORE q.stop() — recentProgress survives the stop but stays explicit. */
  private def requireMultiBatch(q: org.apache.spark.sql.streaming.StreamingQuery,
                                minDataBatches: Int): Unit = {
    val n = q.recentProgress.count(_.numInputRows > 0)
    require(n >= minDataBatches,
      s"streaming gate expected >= $minDataBatches data micro-batches " +
        s"(cross-batch state proof), saw $n among ${q.recentProgress.length} " +
        "retained progress records (cap: spark.sql.streaming." +
        "numRecentProgressUpdates, raised to 1000 on gate sessions)")
  }

  /** Shared staging of the reference-topology trip feed (round-13 verdict
    * #2/#3): the events table as [[tripChunks]] ascending event-time range
    * chunks — the arrival contract a log-shipping ingest satisfies by
    * construction — plus ONE far-future sentinel chunk (user −1) that walks
    * the watermark past every real day's end + the 1-day delay, flushing
    * both the station-day aggregate and the anomaly windows. ONE staging
    * serves ALL driver-checked reference streams (`station_day_agg_stream`,
    * `window_anomalies_stream`, the TWS and restart twins) — the staging is
    * a pure function of the corpus, so sharing it is the round-14 fixed-cost
    * trim, not a semantic coupling; each query still lands into its OWN dir
    * through its own checkpoint. NULLs in `value` are staged as-is: the
    * declarative avg skips them exactly like the batch aggregate and the
    * DuckDB oracle (and since round 15 the TYPED path's Option[Double]
    * temperature skips them identically — TypedAgg.reduce).
    *
    * Returns (scratch base, last real day, last real event time) — the
    * day/ts bounds the snapshots use to drop the sentinel's own far-future
    * groups (real groups all start at-or-before them; sentinel groups all
    * after). */
  private def tripStageBase(spark: SparkSession,
                            sfDir: String): (String, java.sql.Date, java.sql.Timestamp) = {
    val ev = Tables.events(spark, sfDir)
    val base = Tables.scratchDir("graft_tripstream", ev)
    val chunks = tripChunks
    val mm = ev.agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head()
    val (tLo, tHi) =
      if (mm.isNullAt(0)) (0L, -1L) else (mm.getLong(0), mm.getLong(1))
    // fail FAST on a corpus whose event-time span cannot fill every chunk
    // (e.g. all rows in one µs): a range chunk would stage empty, its
    // landing would carry no rows, and requireMultiBatch would later fail
    // with a misleading "not multi-batch" — but the real condition is that
    // a multi-batch ingest PROOF is meaningless on an unsplittable corpus,
    // so say exactly that here (round-15 review)
    require(tHi - tLo + 1 >= chunks,
      s"trip-stream staging needs an event-time span of >= $chunks µs to " +
        s"stage $chunks nonempty chunks (got [$tLo, $tHi]); a corpus that " +
        "cannot split cannot support the multi-batch recovery/state proof")
    val bound = (c: Int) =>
      (BigInt(tLo) + (BigInt(tHi) - tLo + 1) * c / chunks).toLong
    def inChunk(c: Int) =
      unix_micros(col("ts")) >= bound(c) && unix_micros(col("ts")) < bound(c + 1)
    // ONE sentinel round at tHi + 2 days + 1 h: it puts the 1-day-delay
    // watermark a full hour past every real day's end (≤ tHi + 1 day), so
    // the live streams also exercise watermark-driven state EVICTION (the
    // update-mode snapshots don't need a flush for emission — groups emit
    // on data — but T3 eviction should run in the gated topology too);
    // Spark's no-data micro-batch applies the advanced watermark in the
    // same drain (the asOfSentinelRounds A/B)
    val sentTs = new java.sql.Timestamp(tHi / 1000L + 2 * 86400000L + 3600000L)
    ensureStaged((0 to chunks).map(c => s"$base/stage$c")) {
      (0 until chunks).foreach { c =>
        ev.filter(inChunk(c))
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("ts"), col("value"), col("props"))
          .coalesce(1).write.mode("overwrite").parquet(s"$base/stage$c")
      }
      val sqlc = spark
      import sqlc.implicits._
      Seq((-1L, -1L, "view", sentTs, 0.0, """{"k":0}"""))
        .toDF("event_id", "user_id", "event_type", "ts", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(s"$base/stage$chunks")
    }
    val maxDay = java.sql.Date.valueOf(
      java.time.LocalDate.ofEpochDay(Math.floorDiv(tHi, 86400000000L)))
    (base, maxDay, new java.sql.Timestamp(tHi / 1000L))
  }

  private val tripStreamSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("user_id", LongType),
    StructField("event_type", StringType), StructField("ts", TimestampType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** The reference's FLAGSHIP computation as a driver-checked stream
    * (round-13 verdict #2 — the `etl-topic` output, reference
    * CustomTransformer.kt:22-46 + scripts/consumer.sh:6): the staged event
    * chunks land in ascending event-time order, the live query runs the
    * full topology — stream–static broadcast enrich
    * ([[graft.operators.TripEtl.enrichTrips]]) into the shared update-mode
    * per-(station, day) aggregate ([[StreamingEtl.stationDayAggStreaming]],
    * 1-day tumbling window + 1-day watermark, decimal-exact avg) — and the
    * memory sink records every refreshed group emission (station × day
    * grid-bounded at ANY corpus: that is the aggregate's state bound, so
    * the sink discipline holds). The snapshot is the LATEST emission per
    * (station, day), selected by max-struct on started+ended — strictly
    * increasing per re-emission because every folded event increments
    * exactly one of the two counts — with the sentinel's own far-future
    * day groups dropped by the staged day bound. `station_day_agg`'s
    * DuckDB oracle applies VERBATIM, row count included: an unflushed or
    * double-counted group fails the hash. */
  def stationDayAggStream(spark: SparkSession, sfDir: String): DataFrame = {
    val (base, maxDay, _) = tripStageBase(spark, sfDir)
    Seq("aggCkpt", "aggIn", "aggTmp").foreach(d => wipe(s"$base/$d"))
    // state = stations × open days — grid-bounded, the family sizing rule
    val ss = streamSession(spark, shufflePartitions = 4)
    val name = s"stationday_stream_snap_${seq.incrementAndGet()}"
    val enriched = graft.operators.TripEtl.enrichTrips(
      ss.readStream.schema(tripStreamSchema).parquet(s"$base/aggIn"),
      Tables.supplier(ss, sfDir))
    val q = StreamingEtl.stationDayAggStreaming(enriched)
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", s"$base/aggCkpt")
      .outputMode("update").start()
    try {
      (0 to tripChunks).foreach { c =>
        landChunk(s"$base/stage$c", s"$base/aggTmp", s"$base/aggIn", s"stage$c")
        q.processAllAvailable()
      }
      requireMultiBatch(q, tripChunks + 1) // data chunks + sentinel
    } finally q.stop()
    ss.table(name)
      .groupBy(col("station_name"), col("event_day"))
      .agg(max(struct(
        (col("started_trips") + col("ended_trips")).as("n"),
        col("started_trips"), col("ended_trips"),
        col("avg_temperature"), col("update_time"))).as("last"))
      .filter(col("event_day") <= lit(maxDay)) // drop the sentinel's groups
      .select(col("station_name"), col("event_day"),
        col("last.started_trips").as("started_trips"),
        col("last.ended_trips").as("ended_trips"),
        col("last.avg_temperature").as("avg_temperature"),
        col("last.update_time").as("update_time"))
  }

  /** CHECKPOINT-RECOVERY as a driver-checked query — the T6 gate (round-15
    * verdict #1, the last SURVEY §2 semantic proven only by specs): the
    * reference's `commit.interval.ms = 0` + `streams.cleanUp()` contract
    * (reference KafkaConsumer.kt:69, :75) is "state survives a restart and
    * no record is lost or double-counted", and this query executes exactly
    * that against the hash gate. The flagship station-day topology runs over
    * the SAME staged chunks as [[stationDayAggStream]], but the first query
    * is STOPPED after landing chunk 0 and its checkpoint is then TORN —
    * the newest commit-log entry is deleted while its offsets entry and
    * the sink manifest stay, the exact on-disk state a crash between
    * sink commit and commit-log write leaves (round-15 advisor: a
    * graceful stop alone only proved CLEAN restart, never replay). A
    * brand-new query then starts from the SAME checkpoint — Spark
    * reloads the aggregation state store and the file-source/sink commit
    * logs, RE-EXECUTES the uncommitted batch (its presence is asserted
    * from the progress record), and the manifest dedups the replayed
    * emission — then lands the remaining chunk(s) plus the sentinel.
    * Pre-restart partial counts MUST survive into the post-restart folds
    * or the day totals (and the hash) come out short; a sink that
    * re-appended the replayed batch would double-count and overshoot.
    *
    * Sink discipline differs from the uninterrupted twin BY NECESSITY:
    * Spark refuses to recover an update-mode MEMORY sink from a checkpoint
    * (it is not fault-tolerant — `DataStreamWriter` only allows memory-sink
    * recovery in Complete mode), and that refusal is the point of T6: a
    * restart gate needs a sink with a commit log. So this twin runs the
    * aggregation in APPEND mode into a PARQUET file sink — the file-sink
    * `_spark_metadata` manifest is the exactly-once commit the reference's
    * `commit.interval.ms = 0` approximates — where each (station, day)
    * emits exactly once after the watermark closes its day (the sentinel
    * walks the watermark past every real day, the same flush the as-of
    * family uses). No latest-emission selector is needed: the appended set
    * IS the final aggregate, and `station_day_agg`'s oracle SQL applies
    * VERBATIM — the third consumer of that one string, pinning
    * restart ≡ update-mode stream ≡ punctuator ≡ batch. */
  def stationDayAggStreamRestart(spark: SparkSession, sfDir: String): DataFrame = {
    val (base, maxDay, _) = tripStageBase(spark, sfDir)
    Seq("rstCkpt", "rstIn", "rstTmp", "rstSink").foreach(d => wipe(s"$base/$d"))
    val ss = streamSession(spark, shufflePartitions = 4)
    // ONE definition of the query, started twice: the restart must rebuild
    // the IDENTICAL plan against the same checkpoint, as a crashed driver's
    // replacement would
    def start() = StreamingEtl.stationDayAggStreaming(
        graft.operators.TripEtl.enrichTrips(
          ss.readStream.schema(tripStreamSchema).parquet(s"$base/rstIn"),
          Tables.supplier(ss, sfDir)))
      .writeStream.format("parquet").option("path", s"$base/rstSink")
      .option("checkpointLocation", s"$base/rstCkpt")
      .outputMode("append").start()
    val q1 = start()
    try {
      landChunk(s"$base/stage0", s"$base/rstTmp", s"$base/rstIn", "stage0")
      q1.processAllAvailable()
      requireMultiBatch(q1, 1)
    } finally q1.stop()
    // The crash is made TORN, not graceful (round-15 advisor: a plain
    // stop() after processAllAvailable leaves a fully-committed
    // checkpoint, so restart only proved clean recovery, never replay):
    // deleting the newest commit-log entry while keeping its offsets
    // entry reconstructs exactly the on-disk state a driver crash
    // BETWEEN the sink's manifest write and the commit-log write leaves
    // behind. On restart Spark sees offsets/N without commits/N and MUST
    // re-execute batch N — same batch id, same input files, watermark
    // replayed from the offsets metadata — and the file sink's
    // `_spark_metadata` manifest, which already recorded batch N, must
    // dedup the replayed emission. A sink that appended again would
    // double-count into the oracle hash; a state store that couldn't
    // rewind to version N would miscount the day totals.
    val torn = tearNewestCommit(s"$base/rstCkpt")
    val t0 = System.nanoTime()
    val q2 = start()    // recovery: offsets, REPLAYED batch, state, manifest
    try {
      // drain the torn batch's replay BEFORE any new landing: the wall of
      // this call is the isolated restart price (checkpoint reload + state
      // version rewind + one re-executed batch), reported to stderr so the
      // SCALE.md reload-vs-landing decomposition is measured, not asserted
      // (round-15 verdict #5); the replay would otherwise just fold into
      // the first landing's drain — same total work, unobservable split
      q2.processAllAvailable()
      System.err.println("graft: stationDayAggStreamRestart reload+replay " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s")
      (1 to tripChunks).foreach { c =>
        landChunk(s"$base/stage$c", s"$base/rstTmp", s"$base/rstIn", s"stage$c")
        q2.processAllAvailable()
      }
      requireReplayed(q2, torn)         // the torn batch really re-executed
      requireMultiBatch(q2, tripChunks) // post-restart chunks + sentinel
    } finally q2.stop()
    val outSchema = StructType(Seq(
      StructField("station_name", StringType),
      StructField("event_day", DateType),
      StructField("started_trips", LongType),
      StructField("ended_trips", LongType),
      StructField("avg_temperature", DoubleType),
      StructField("update_time", TimestampType)))
    // the file-sink manifest lists only COMMITTED files — reading through
    // it is part of the exactly-once contract under test
    spark.read.schema(outSchema).parquet(s"$base/rstSink")
      .filter(col("event_day") <= lit(maxDay)) // the sentinel's day never
                                               // emits, but stay uniform
  }

  /** The reference PUNCTUATOR itself as a driver-checked stream (round-14
    * stretch on top of verdict #2): where [[stationDayAggStream]] gates the
    * declarative update-mode aggregate, this runs the
    * `transformWithState` full-snapshot punctuation
    * ([[StreamingEtl.punctuatedFullSnapshotAggTws]] — the faithful
    * CustomTransformer.kt:56-69 cadence: NOTHING forwards between
    * watermark-aligned boundary sweeps, every live group forwards at each
    * sweep, closed days evict with a final snapshot). Gate-able verbatim
    * since round 14 because the typed buffer went decimal-exact
    * ([[graft.operators.TypedAgg.Buf]]): the emitted mean now lands on the
    * oracle's rounding grid for ANY arrival order. Same staging, landing
    * protocol, and latest-emission selector as the declarative twin; the
    * two queries sharing one oracle SQL means the gate also pins
    * punctuator ≡ update-mode agg on real data. */
  def stationDayAggStreamTws(spark: SparkSession, sfDir: String): DataFrame = {
    val (base, maxDay, _) = tripStageBase(spark, sfDir)
    Seq("twsCkpt", "twsIn", "twsTmp").foreach(d => wipe(s"$base/$d"))
    val ss = streamSession(spark, shufflePartitions = 4)
    ss.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import ss.implicits._
    val name = s"stationday_tws_snap_${seq.incrementAndGet()}"
    val trips = graft.operators.TripEtl.enrichTrips(
        ss.readStream.schema(tripStreamSchema).parquet(s"$base/twsIn"),
        Tables.supplier(ss, sfDir))
      .select(col("station_name").as("stationName"),
        col("trip_time").as("tripTime"),
        col("trip_type").as("tripType"), col("temperature"))
      .as[graft.model.TripStation]
    val q = StreamingEtl.punctuatedFullSnapshotAggTws(trips)
      .toDF().writeStream.format("memory").queryName(name)
      .option("checkpointLocation", s"$base/twsCkpt")
      .outputMode("update").start()
    try {
      (0 to tripChunks).foreach { c =>
        landChunk(s"$base/stage$c", s"$base/twsTmp", s"$base/twsIn", s"stage$c")
        q.processAllAvailable()
      }
      requireMultiBatch(q, tripChunks + 1) // data chunks + sentinel
    } finally q.stop()
    ss.table(name)
      .groupBy(col("stationName"), col("eventDay"))
      .agg(max(struct(
        (col("startedTrips") + col("endedTrips")).as("n"),
        col("startedTrips"), col("endedTrips"),
        col("avgTemperature"), col("updateTime"))).as("last"))
      .filter(col("eventDay") <= lit(maxDay)) // drop the sentinel's groups
      .select(col("stationName").as("station_name"),
        col("eventDay").as("event_day"),
        col("last.startedTrips").as("started_trips"),
        col("last.endedTrips").as("ended_trips"),
        col("last.avgTemperature").as("avg_temperature"),
        col("last.updateTime").as("update_time"))
  }

  /** The reference's SECOND declared output topic as a driver-checked
    * stream (round-13 verdict #3 — `anomalies-topic`, reference
    * TripStationSummaryInfo.kt:17-25 + scripts/consumer.sh:7): the SAME
    * staged chunks (one staging serves both reference streams) land
    * through an independent checkpoint into the live anomaly topology —
    * broadcast enrich → tumbling 360-min windowed counts → summary /
    * threshold score ([[StreamingEtl.windowAnomaliesStreaming]], update
    * mode). The snapshot takes each (window, station)'s LATEST emission by
    * max-struct on the strictly-increasing `n_events` harness column,
    * drops it, and `window_anomalies`' DuckDB oracle hashes the streamed
    * scores verbatim — ratio rounding included. */
  def windowAnomaliesStream(spark: SparkSession, sfDir: String,
                            windowMinutes: Int = 360,
                            pPercent: Int = 50): DataFrame = {
    val (base, _, maxTs) = tripStageBase(spark, sfDir)
    Seq("anomCkpt", "anomIn", "anomTmp").foreach(d => wipe(s"$base/$d"))
    // state = stations × open windows — grid-bounded per the watermark
    val ss = streamSession(spark, shufflePartitions = 4)
    val name = s"windowanom_stream_snap_${seq.incrementAndGet()}"
    val enriched = graft.operators.TripEtl.enrichTrips(
      ss.readStream.schema(tripStreamSchema).parquet(s"$base/anomIn"),
      Tables.supplier(ss, sfDir))
    val q = StreamingEtl.windowAnomaliesStreaming(enriched, windowMinutes, pPercent)
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", s"$base/anomCkpt")
      .outputMode("update").start()
    try {
      (0 to tripChunks).foreach { c =>
        landChunk(s"$base/stage$c", s"$base/anomTmp", s"$base/anomIn", s"stage$c")
        q.processAllAvailable()
      }
      requireMultiBatch(q, tripChunks + 1) // data chunks + sentinel
    } finally q.stop()
    ss.table(name)
      .groupBy(col("window_start"), col("station_name"))
      .agg(max(struct(col("n_events"),
        col("returned_over_rented"), col("rented_over_returned"),
        col("total_docks"), col("n_to_docks_ratio"), col("is_anomaly")))
        .as("last"))
      .filter(col("window_start") <= lit(maxTs)) // sentinel windows are later
      .select(col("window_start"), col("station_name"),
        col("last.returned_over_rented").as("returned_over_rented"),
        col("last.rented_over_returned").as("rented_over_returned"),
        col("last.total_docks").as("total_docks"),
        col("last.n_to_docks_ratio").as("n_to_docks_ratio"),
        col("last.is_anomaly").as("is_anomaly"))
  }

  /** The STREAM–STREAM backward as-of join, driver-checked (round-12
    * verdict #1): purchases and errors are staged as FOUR ascending
    * event-time range chunks EACH (the arrival contract a log-shipping
    * ingest satisfies by construction — both feeds land roughly in event
    * order, and the watermark delay absorbs the residual disorder; here
    * chunk ranges make it exact), landed pairwise and drained, so lefts
    * buffer across micro-batches, rights dominance-prune, and every
    * release is watermark-gated through
    * [[StreamAsOf.asOfEnrichStreams]]'s transformWithState processor.
    *
    * FLUSH: the global watermark is the MIN over both branches'
    * watermark nodes, so each sentinel round lands a far-future row on
    * BOTH sides (sentinel user −1 — matches nothing, filtered from the
    * snapshot; its own left is never released). One round suffices: the
    * sentinel batch advances the watermark and Spark's no-data
    * micro-batch then fires every released timer ([[asOfSentinelRounds]]
    * — A/B'd against two rounds, identical output). After the flush every
    * REAL purchase has been emitted exactly once with its latest
    * at-or-before error, so
    * `asof_last_error`'s DuckDB `ASOF JOIN` oracle hashes the STREAMED
    * join verbatim — including the row COUNT: an unflushed left fails
    * the gate as a missing row, an over-release as a duplicate. */
  /** Number of far-future sentinel landing rounds the as-of pair uses to
    * flush watermark-held state at stream end. ONE round suffices — Spark
    * runs a no-data micro-batch whenever a batch's data advances the
    * watermark (`noDataMicroBatches`, on by default), and that batch fires
    * every timer the new watermark released — but the count is a named
    * constant so the A/B that established it (PLANS.md round-14 notes:
    * 1-round output row counts hash-identical to 2-round, both oracles
    * green) stays legible and revertible. */
  private val asOfSentinelRounds = 1

  /** SHARED staging for BOTH stream–stream as-of queries (round-13 verdict
    * #4 — the backward and forward joins staged the same purchase/error
    * chunk ranges twice): purchases and errors each as FOUR ascending
    * event-time range chunks with uniform (event_id, user_id, ts, value)
    * columns — each query renames per its own side assignment post-read —
    * plus the sentinel rounds. Sentinel steps are the FORWARD join's
    * requirement (tolerance + delay margin: a forward left is decidable
    * only at wm > ts + tol); the backward join needs only wm > tHi, which
    * any forward-compatible schedule satisfies. Shared time-range bounds
    * for both sides keep cross-feed arrival inside the watermark delay. */
  private def asOfStageBase(spark: SparkSession, sfDir: String,
                            toleranceMs: Long): (String, Int) = {
    val ev = Tables.events(spark, sfDir)
    // tolerance is part of the staging key: the sentinel schedule is a
    // function of it, and a (name, corpus)-only key would silently serve
    // one tolerance's sentinels to a caller using another
    val base = Tables.scratchDir(s"graft_asofshared_t$toleranceMs", ev)
    // TWO data chunks (round-15 chunk-lever trim, was four): lefts still
    // buffer across micro-batches and rights still dominance-prune across
    // the chunk boundary — requireMultiBatch asserts the multi-batch shape
    // on every run — while each dropped landing stops re-paying the
    // per-micro-batch scheduling fixed cost on the same rows
    val chunks = 2
    val mm = ev.filter(col("event_type").isin("purchase", "error"))
      .agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head()
    val (tLo, tHi) =
      if (mm.isNullAt(0)) (0L, -1L) else (mm.getLong(0), mm.getLong(1))
    // unsplittable-corpus fail-fast, as in tripStageBase: with two chunks,
    // tLo lands in chunk 0 and tHi in chunk 1, so a 2-µs span guarantees
    // every paired landing round carries rows (union across both sides)
    require(tHi - tLo + 1 >= chunks,
      s"as-of staging needs a purchase/error event-time span of >= $chunks " +
        s"µs to stage $chunks nonempty chunk rounds (got [$tLo, $tHi])")
    // time-range quarters (BigInt: the span·c product must not wrap)
    val bound = (c: Int) =>
      (BigInt(tLo) + (BigInt(tHi) - tLo + 1) * c / chunks).toLong
    def inChunk(c: Int) =
      unix_micros(col("ts")) >= bound(c) && unix_micros(col("ts")) < bound(c + 1)
    // each sentinel round clears tol + an hour's margin past the previous
    // maximum (µs → ms floor is dominated by the margin)
    def sentTs(round: Int) = new java.sql.Timestamp(
      tHi / 1000L + (round + 1) * (toleranceMs + 3600L * 1000L))
    val stageDirs = (0 until chunks + asOfSentinelRounds)
      .flatMap(c => Seq(s"$base/stageP$c", s"$base/stageE$c"))
    ensureStaged(stageDirs) {
      (0 until chunks).foreach { c =>
        ev.filter(col("event_type") === "purchase" && inChunk(c))
          .select(col("event_id"), col("user_id"), col("ts"),
            coalesce(col("value"), lit(0.0)).as("value"))
          .coalesce(1).write.mode("overwrite").parquet(s"$base/stageP$c")
        ev.filter(col("event_type") === "error" && inChunk(c))
          .select(col("event_id"), col("user_id"), col("ts"),
            coalesce(col("value"), lit(0.0)).as("value"))
          .coalesce(1).write.mode("overwrite").parquet(s"$base/stageE$c")
      }
      val sqlc = spark
      import sqlc.implicits._
      (0 until asOfSentinelRounds).foreach { i =>
        Seq((-1L, -1L, sentTs(i), 0.0)).toDF("event_id", "user_id", "ts", "value")
          .coalesce(1).write.mode("overwrite").parquet(s"$base/stageP${chunks + i}")
        Seq((-1L, -1L, sentTs(i), 0.0)).toDF("event_id", "user_id", "ts", "value")
          .coalesce(1).write.mode("overwrite").parquet(s"$base/stageE${chunks + i}")
      }
    }
    (base, chunks + asOfSentinelRounds)
  }

  private val asOfFeedSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("user_id", LongType),
    StructField("ts", TimestampType), StructField("value", DoubleType)))

  def asOfStreamLastError(spark: SparkSession, sfDir: String): DataFrame = {
    // tolerance here only fixes the shared sentinel schedule (the backward
    // join has none of its own); it must match the forward twin's
    val (base, rounds) = asOfStageBase(spark, sfDir, toleranceMs = 3600000L)
    Seq("bwdCkpt", "bwdInP", "bwdInE", "bwdTmp").foreach(d => wipe(s"$base/$d"))
    // per-user ListState is small (watermark-bounded lefts + pruned
    // rights), so 4 state partitions carry it at ANY corpus — the
    // covStreamSnapshot sizing rule; transformWithState requires the
    // RocksDB provider (set on the clone only)
    val ss = streamSession(spark, shufflePartitions = 4)
    ss.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // PARQUET sink, not memory: the joined output is one row per
    // purchase — corpus scale — and must never accumulate on the driver
    // (the minhash/hnsw-stream sink discipline; memory sinks are for
    // grid/sketch-bounded emissions only)
    wipe(s"$base/bwdSink")
    val q = StreamAsOf.asOfEnrichStreams(
        ss.readStream.schema(asOfFeedSchema).parquet(s"$base/bwdInP")
          .select(col("event_id"), col("user_id"), col("ts")),
        ss.readStream.schema(asOfFeedSchema).parquet(s"$base/bwdInE")
          .select(col("event_id").as("error_id"), col("user_id"), col("ts"),
            col("value")))
      .toDF().writeStream.format("parquet").option("path", s"$base/bwdSink")
      .option("checkpointLocation", s"$base/bwdCkpt")
      .outputMode("append").start()
    try {
      (0 until rounds).foreach { c =>
        landChunk(s"$base/stageP$c", s"$base/bwdTmp", s"$base/bwdInP", s"P$c")
        landChunk(s"$base/stageE$c", s"$base/bwdTmp", s"$base/bwdInE", s"E$c")
        q.processAllAvailable()
      }
      requireMultiBatch(q, rounds) // paired data landings + sentinel
    } finally q.stop()
    val outSchema = StructType(Seq(
      StructField("userId", LongType), StructField("eventId", LongType),
      StructField("ts", TimestampType), StructField("errorId", LongType),
      StructField("errorTs", TimestampType), StructField("errorValue", DoubleType)))
    spark.read.schema(outSchema).parquet(s"$base/bwdSink")
      .filter(col("userId") >= 0L) // drop the flushed sentinel
      .select(col("eventId").as("event_id"), col("userId").as("user_id"),
        col("ts"), col("errorTs").as("last_error_ts"))
  }

  /** CHECKPOINT-RECOVERY for the stream–stream as-of join (round-15 stretch,
    * verdict #8): of every stateful shape in the engine this is the hardest
    * to recover — per-user ListState of buffered lefts, dominance-pruned
    * rights, AND armed event-time timers must all come back from the RocksDB
    * checkpoint for the released rows to be right. Harness =
    * [[stationDayAggStreamRestart]]'s pattern over [[asOfStageBase]]'s
    * shared staging: the first query ingests the first paired landing and
    * is stopped; a brand-new query starts from the SAME checkpoint and
    * lands the remaining pair(s) plus the sentinel round. A left buffered
    * before the stop must be released by a right (or the watermark) that
    * arrives only AFTER the restart; lost timer state would strand it
    * (missing row → hash fail), a replayed release would duplicate it (the
    * parquet sink's manifest must dedupe the uncommitted tail). Oracle =
    * `asof_last_error`'s DuckDB ASOF JOIN verbatim, row count included. */
  def asOfStreamLastErrorRestart(spark: SparkSession, sfDir: String): DataFrame = {
    val (base, rounds) = asOfStageBase(spark, sfDir, toleranceMs = 3600000L)
    Seq("rbwdCkpt", "rbwdInP", "rbwdInE", "rbwdTmp", "rbwdSink")
      .foreach(d => wipe(s"$base/$d"))
    val ss = streamSession(spark, shufflePartitions = 4)
    ss.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    def start() = StreamAsOf.asOfEnrichStreams(
        ss.readStream.schema(asOfFeedSchema).parquet(s"$base/rbwdInP")
          .select(col("event_id"), col("user_id"), col("ts")),
        ss.readStream.schema(asOfFeedSchema).parquet(s"$base/rbwdInE")
          .select(col("event_id").as("error_id"), col("user_id"), col("ts"),
            col("value")))
      .toDF().writeStream.format("parquet").option("path", s"$base/rbwdSink")
      .option("checkpointLocation", s"$base/rbwdCkpt")
      .outputMode("append").start()
    val q1 = start()
    try {
      landChunk(s"$base/stageP0", s"$base/rbwdTmp", s"$base/rbwdInP", "P0")
      landChunk(s"$base/stageE0", s"$base/rbwdTmp", s"$base/rbwdInE", "E0")
      q1.processAllAvailable()
      requireMultiBatch(q1, 1)
    } finally q1.stop() // ListState, timers, offsets stay put
    // Torn crash, as in [[stationDayAggStreamRestart]]: drop the newest
    // commit-log entry so q2 must RE-EXECUTE the uncommitted batch on top
    // of the recovered RocksDB state — replayed transformWithState
    // processing must re-arm the same timers and re-emit the same rows,
    // and the parquet sink's manifest must dedup them (round-15 advisor:
    // the graceful stop alone never exercised the replay path)
    val torn = tearNewestCommit(s"$base/rbwdCkpt")
    val t0 = System.nanoTime()
    val q2 = start()    // recovery + replay from the same RocksDB checkpoint
    try {
      // isolated restart price (RocksDB reload + replayed batch) — see
      // stationDayAggStreamRestart's decomposition note
      q2.processAllAvailable()
      System.err.println("graft: asOfStreamLastErrorRestart reload+replay " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s")
      (1 until rounds).foreach { c =>
        landChunk(s"$base/stageP$c", s"$base/rbwdTmp", s"$base/rbwdInP", s"P$c")
        landChunk(s"$base/stageE$c", s"$base/rbwdTmp", s"$base/rbwdInE", s"E$c")
        q2.processAllAvailable()
      }
      requireReplayed(q2, torn)      // the torn batch really re-executed
      requireMultiBatch(q2, rounds - 1)
    } finally q2.stop()
    val outSchema = StructType(Seq(
      StructField("userId", LongType), StructField("eventId", LongType),
      StructField("ts", TimestampType), StructField("errorId", LongType),
      StructField("errorTs", TimestampType), StructField("errorValue", DoubleType)))
    spark.read.schema(outSchema).parquet(s"$base/rbwdSink")
      .filter(col("userId") >= 0L) // drop the flushed sentinel
      .select(col("eventId").as("event_id"), col("userId").as("user_id"),
        col("ts"), col("errorTs").as("last_error_ts"))
  }

  /** The STREAM–STREAM FORWARD as-of join, driver-checked — completing
    * the direction matrix in the gate ([[asOfStreamLastError]] is the
    * backward twin): each error matched to the EARLIEST purchase within
    * the 1-hour tolerance after it, cross-batch, through
    * [[StreamAsOf.asOfNextStreams]]'s transformWithState processor (the
    * tolerance is what makes the forward join decidable and the state
    * bounded — the operator's own contract). Harness as the backward
    * twin — literally: BOTH queries drain the one [[asOfStageBase]]
    * staging (four shared event-time range chunks per side, pairwise
    * landings, [[asOfSentinelRounds]] sentinel round(s) stepped by
    * tolerance + 1 h, because a forward left is only decidable once the
    * watermark passes ts + tol) — parquet sink, sentinel user −1
    * filtered. Oracle = `asof_next_purchase`'s window-form SQL verbatim,
    * row count included. */
  def asOfStreamNextPurchase(spark: SparkSession, sfDir: String,
                             toleranceMs: Long = 3600000L): DataFrame = {
    // SHARED staging with the backward twin (round-13 verdict #4): errors
    // land as this join's LEFTS (from stageE), purchases as its RIGHTS
    // (from stageP) — the same chunk files, renamed per side post-read
    val (base, rounds) = asOfStageBase(spark, sfDir, toleranceMs)
    Seq("fwdCkpt", "fwdInL", "fwdInR", "fwdTmp").foreach(d => wipe(s"$base/$d"))
    val ss = streamSession(spark, shufflePartitions = 4)
    ss.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    wipe(s"$base/fwdSink")
    val q = StreamAsOf.asOfNextStreams(
        ss.readStream.schema(asOfFeedSchema).parquet(s"$base/fwdInL")
          .select(col("event_id"), col("user_id"), col("ts")),
        ss.readStream.schema(asOfFeedSchema).parquet(s"$base/fwdInR"),
        toleranceMs = toleranceMs)
      .toDF().writeStream.format("parquet").option("path", s"$base/fwdSink")
      .option("checkpointLocation", s"$base/fwdCkpt")
      .outputMode("append").start()
    try {
      (0 until rounds).foreach { c =>
        landChunk(s"$base/stageE$c", s"$base/fwdTmp", s"$base/fwdInL", s"L$c")
        landChunk(s"$base/stageP$c", s"$base/fwdTmp", s"$base/fwdInR", s"R$c")
        q.processAllAvailable()
      }
      requireMultiBatch(q, rounds) // paired data landings + sentinel
    } finally q.stop()
    val outSchema = StructType(Seq(
      StructField("userId", LongType), StructField("eventId", LongType),
      StructField("ts", TimestampType), StructField("matchedId", LongType),
      StructField("matchedTs", TimestampType),
      StructField("matchedValue", DoubleType)))
    spark.read.schema(outSchema).parquet(s"$base/fwdSink")
      .filter(col("userId") >= 0L) // drop the flushed sentinel
      .select(col("eventId").as("event_id"), col("userId").as("user_id"),
        col("ts"), col("matchedTs").as("next_purchase_ts"))
  }

  /** Streaming gap sessionization, driver-checked (round-12 verdict #2)
    * — the SEVENTH streaming-maintenance proof and the first over
    * MERGING (not additive/idempotent) state: the event stream lands as
    * four ascending event-time range chunks, the native `session_window`
    * state merges bursts across micro-batches
    * ([[StreamingEtl.sessionWindows]] — the same core the §2-parity
    * trip-session operator runs), and APPEND mode emits each session
    * exactly once when the watermark passes its end. In-order chunk
    * arrival makes stream ≡ batch unconditional: an event that could
    * merge into a session always arrives before the watermark can close
    * it (it is at most `gap` past the session's last event, and the
    * watermark lags the landed maximum by the full delay).
    *
    * FLUSH: one far-future sentinel row (user −1, whose own session is
    * never emitted) walks the watermark past every real session's end +
    * gap; the no-data micro-batch then emits the closed sessions in the
    * same drain. The snapshot tail re-derives the batch presentation —
    * `session_seq` by start order per user (disjoint sessions make
    * row_number deterministic), `session_end` = last event (the batch
    * convention; session_window.end is last + gap by definition) — so
    * `user_sessions`' DuckDB oracle hashes the streamed session set
    * verbatim. Boundary semantics match the batch operator exactly:
    * events exactly `gap` apart merge (probed; RelationalSpec pins the
    * batch side, StreamingEtlSpec the stream side). */
  def userSessionsStream(spark: SparkSession, sfDir: String,
                         gapMinutes: Int = 30): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val base = Tables.scratchDir("graft_sessstream", ev)
    Seq("ckpt", "in", "tmp").foreach(d => wipe(s"$base/$d"))
    // two data chunks (round-15 chunk-lever trim, was four): session MERGE
    // still happens across the chunk boundary — requireMultiBatch asserts
    // the multi-batch shape — at half the per-landing scheduling fixed cost
    val chunks = 2
    val mm = ev.agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head()
    val (tLo, tHi) =
      if (mm.isNullAt(0)) (0L, -1L) else (mm.getLong(0), mm.getLong(1))
    // unsplittable-corpus fail-fast, as in tripStageBase
    require(tHi - tLo + 1 >= chunks,
      s"session staging needs an event-time span of >= $chunks µs to " +
        s"stage $chunks nonempty chunks (got [$tLo, $tHi])")
    val bound = (c: Int) =>
      (BigInt(tLo) + (BigInt(tHi) - tLo + 1) * c / chunks).toLong
    // ONE sentinel at +2h: it puts the watermark (delay 1h) past every
    // real session end (≤ tHi + gap), and Spark's no-data micro-batch
    // applies the advanced watermark — emitting the closed sessions —
    // inside the same drain (the asOfSentinelRounds A/B: one round's
    // output is row-for-row the two-round output)
    val sentTs = new java.sql.Timestamp(tHi / 1000L + 2 * 3600L * 1000L)
    ensureStaged((0 to chunks).map(c => s"$base/stage$c")) {
      (0 until chunks).foreach { c =>
        ev.filter(unix_micros(col("ts")) >= bound(c) &&
            unix_micros(col("ts")) < bound(c + 1))
          .select(col("user_id"), col("ts"))
          .coalesce(1).write.mode("overwrite").parquet(s"$base/stage$c")
      }
      val sqlc = spark
      import sqlc.implicits._
      Seq((-1L, sentTs)).toDF("user_id", "ts")
        .coalesce(1).write.mode("overwrite").parquet(s"$base/stage$chunks")
    }
    val evSchema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts", TimestampType)))
    // session state is O(open sessions) — watermark-bounded, never
    // corpus-bounded; 4 state partitions per the family sizing rule.
    // PARQUET sink: finalized sessions are corpus-scale output and must
    // never accumulate on the driver (the minhash/hnsw sink discipline)
    val ss = streamSession(spark, shufflePartitions = 4)
    wipe(s"$base/sink")
    val q = StreamingEtl.sessionWindows(
        ss.readStream.schema(evSchema).parquet(s"$base/in"),
        tsCol = "ts", keyCol = "user_id",
        gapMinutes = gapMinutes, watermark = "1 hour")
      .writeStream.format("parquet").option("path", s"$base/sink")
      .option("checkpointLocation", s"$base/ckpt")
      .outputMode("append").start()
    try {
      (0 to chunks).foreach { c =>
        landChunk(s"$base/stage$c", s"$base/tmp", s"$base/in", s"stage$c")
        q.processAllAvailable()
      }
      requireMultiBatch(q, chunks + 1) // data chunks + sentinel
    } finally q.stop()
    val outSchema = StructType(Seq(
      StructField("session_start", TimestampType),
      StructField("session_end", TimestampType),
      StructField("user_id", LongType),
      StructField("n_events", LongType),
      StructField("last_event", TimestampType)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("session_start"))
    spark.read.schema(outSchema).parquet(s"$base/sink")
      .filter(col("user_id") >= 0L) // drop the sentinel's open session
      .withColumn("session_seq", row_number().over(w).cast("long"))
      .select(col("user_id"), col("session_seq"), col("session_start"),
        col("last_event").as("session_end"), col("n_events"),
        (unix_micros(col("last_event")) - unix_micros(col("session_start")))
          .as("duration_us"))
  }

  /** Streaming EXACT dedup, driver-checked (round-12 verdict #3): the
    * corpus plus PLANTED replays (every doc_id ≡ 3 mod 7 re-ingested at
    * doc_id + max + 1 — the corpus ships distinct texts, so unplanted
    * streaming dedup would be vacuous) lands in ascending DUPLICATE-RANK
    * order: chunk 0 carries each content's FIRST (minimum-id) copy,
    * later chunks only replays. That is the ingest contract that makes
    * keep-first-arrival ≡ keep-min-id — the batch `doc_dedup_docs`
    * semantics — AND makes the run deterministic: no micro-batch ever
    * holds two rows of one content whose survivor the engine could pick
    * arbitrarily (chunk 0 is distinct by construction; later chunks only
    * hit state, so every row drops regardless of within-batch order).
    * [[StreamingEtl.dedupedDocsStreaming]]'s
    * dropDuplicatesWithinWatermark state carries one digest per distinct
    * content inside the watermark horizon; the staged ingest_ts steps
    * one minute per chunk, all inside the 1-hour horizon, so every
    * replay meets live state. The oracle replays the planting and keeps
    * min(doc_id) per sha256 group — hashing the streamed survivor set
    * verbatim. */
  def dedupStreamDocs(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir).filter(col("text").isNotNull)
    val base = Tables.scratchDir("graft_dedupstream", docs)
    Seq("ckpt", "in", "tmp").foreach(d => wipe(s"$base/$d"))
    val chunks = 4
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    ensureStaged((0 until chunks).map(c => s"$base/stage$c")) {
      val off = docs.agg(max(col("doc_id"))).head().getLong(0) + 1L
      val planted = docs.select(cols.map(col): _*)
        .unionByName(docs.filter(pmod(col("doc_id"), lit(7L)) === 3L)
          .select((col("doc_id") + off).as("doc_id") +: cols.tail.map(col): _*))
      // duplicate rank: the nth copy of a content lands in chunk n−1
      // (ranks past the chunk count lump into the last chunk — all
      // replays, all dropped against state); the arrival column is a
      // pure function of the corpus, so the staging is reusable
      val arrival = least(
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(sha2(col("text"), 256)).orderBy(col("doc_id"))),
        lit(chunks)) - 1
      val ranked = planted.withColumn("arrival", arrival)
      (0 until chunks).foreach { c =>
        ranked.filter(col("arrival") === c).drop("arrival")
          .withColumn("ingest_ts",
            lit(new java.sql.Timestamp(1704067200000L + c * 60000L)))
          .coalesce(1).write.mode("overwrite").parquet(s"$base/stage$c")
      }
    }
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType), StructField("ingest_ts", TimestampType)))
    // state is one 32-byte digest per distinct content in the horizon —
    // 4 partitions shard it at any corpus (the family sizing rule).
    // PARQUET sink: survivors are the corpus itself — the one output that
    // must NEVER sit in driver memory (the minhash/hnsw sink discipline)
    val ss = streamSession(spark, shufflePartitions = 4)
    wipe(s"$base/sink")
    val q = StreamingEtl.dedupedDocsStreaming(
        ss.readStream.schema(docSchema).parquet(s"$base/in"),
        tsCol = "ingest_ts", watermark = "1 hour")
      .writeStream.format("parquet").option("path", s"$base/sink")
      .option("checkpointLocation", s"$base/ckpt")
      .outputMode("append").start()
    try {
      (0 until chunks).foreach { c =>
        landChunk(s"$base/stage$c", s"$base/tmp", s"$base/in", s"stage$c")
        q.processAllAvailable()
      }
      requireMultiBatch(q, 2) // cross-batch state must be genuinely probed
    } finally q.stop()
    val outSchema = StructType(docSchema.fields.toIndexedSeq :+
      StructField("content_hash", StringType))
    spark.read.schema(outSchema).parquet(s"$base/sink")
      .select(cols.map(col): _*)
  }

  /** Streaming heavy hitters, driver-checked (round-12 verdict #4) — the
    * sketch family's streaming proof beyond CM/HLL: the PLANTED-skew
    * event feed ([[graft.operators.Relational.plantHeavyUsers]], the
    * batch query's own fixture) streams through
    * [[StreamingEtl.heavyHittersStreaming]]'s per-type Misra-Gries state
    * (≤ k−1 entries per key forever), and the snapshot takes each type's
    * LAST emission (nTotal strictly increases per re-emission). The tail
    * is the batch operator's own pass 2 — exact recount of the candidate
    * union, real threshold ceil(N·minFrac) — and that is what makes the
    * sketch ORACLE-ABLE: MG's survivor set depends on arrival order, but
    * with Σ_t N_t = N and 1/k < minFrac, a user below every per-type
    * bound sums below N/k < ceil(N·minFrac), so the candidate UNION is a
    * provable superset of the true heavy hitters under ANY order/merge —
    * the exact recount then kills every false candidate. So
    * `event_heavy_users`' plain GROUP BY/HAVING oracle hashes the
    * streamed pipeline verbatim. */
  def heavyStreamUsers(spark: SparkSession, sfDir: String, k: Int = 200,
                       minFrac: Double = 0.01): DataFrame = {
    require(1.0 / k < minFrac,
      s"k=$k too small for minFrac=$minFrac: the per-type union superset " +
        "guarantee needs 1/k < minFrac")
    val ev = Tables.events(spark, sfDir)
    val base = Tables.scratchDir("graft_heavystream", ev)
    wipe(s"$base/ckpt")
    ensureStaged(Seq(s"$base/in")) {
      graft.operators.Relational.plantHeavyUsers(ev)
        .select(col("event_type"), col("user_id"))
        .repartition(24).write.mode("overwrite").parquet(s"$base/in")
    }
    val evSchema = StructType(Seq(
      StructField("event_type", StringType), StructField("user_id", LongType)))
    // state = ≤ 5 types × (k−1) MG entries — sketch-bounded at any SF
    val ss = streamSession(spark, shufflePartitions = 4)
    val name = s"heavy_stream_snap_${seq.incrementAndGet()}"
    val q = StreamingEtl.heavyHittersStreaming(
        ss.readStream.schema(evSchema)
          .option("maxFilesPerTrigger", 8).parquet(s"$base/in"), k = k)
      .toDF().writeStream.format("memory").queryName(name)
      .option("checkpointLocation", s"$base/ckpt")
      .outputMode("update").start()
    try {
      q.processAllAvailable()
      requireMultiBatch(q, 2) // maxFilesPerTrigger makes the run multi-batch
    } finally q.stop()
    val finals = ss.table(name)
      .groupBy(col("eventType"))
      .agg(max(struct(col("nTotal"), col("candidates"))).as("last"))
      .select(col("last.nTotal").as("nTotal"),
        col("last.candidates").as("candidates"))
      .collect() // ≤ #types rows of ≤ k−1 ids — metadata scale, like the
                 // batch operator's own sketch collect
    val n = finals.map(_.getAs[Long]("nTotal")).sum
    val cands = finals
      .flatMap(_.getAs[scala.collection.Seq[Long]]("candidates")).distinct.toSeq
    val threshold = math.ceil(n * minFrac).toLong
    graft.operators.Relational.plantHeavyUsers(Tables.events(ss, sfDir))
      .filter(col("user_id").isin(cands: _*))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .filter(col("n_events") >= threshold)
  }

  /** The END-TO-END standing curation job, driver-checked (round-12
    * verdict #5): tar landing shards → streaming exact dedup → per-batch
    * output tar shards, all through
    * [[graft.streaming.ShardPipeline.reshardDeduped]] — tar DSv2 source,
    * dropDuplicates state, foreachBatch tar sink, exactly-once. The
    * corpus plus planted replays (doc_id ≡ 3 mod 7 at doc_id + max + 1)
    * is packed into ONE tar shard per id-range chunk (one file per
    * landing so a drain is always one micro-batch; the pipeline's
    * content re-key rebalances lumpy landings by design), chunks land in
    * ascending-id order, and the snapshot reads the OUTPUT shards back
    * through the connector, aggregating per batch dir (rank-ordered =
    * landing order): member count, payload bytes, XOR of the portable
    * content hash. Content-keyed aggregation makes within-batch survivor
    * choice irrelevant (twins share bytes), so the closed-form oracle —
    * one representative per sha256 group, batched by the chunk of its
    * MIN id, the wds_roundtrip recipe — hashes the whole pipeline: a
    * replay surviving dedup surfaces as an extra batch dir (row-count
    * fail), a lost/corrupt member flips count or XOR. */
  def reshardStreamShards(spark: SparkSession, sfDir: String,
                          nShards: Int = 4): DataFrame = {
    val docs = Tables.documents(spark, sfDir).filter(col("text").isNotNull)
    val base = Tables.scratchDir("graft_reshardstream", docs)
    Seq("ckpt", "in", "out", "tmp").foreach(d => wipe(s"$base/$d"))
    val chunks = 4
    val mm = docs.agg(min(col("doc_id")), max(col("doc_id"))).head()
    val (idLo, idHi) =
      if (mm.isNullAt(0)) (0L, -1L) else (mm.getLong(0), mm.getLong(1))
    val off = idHi + 1L
    val halfSpan = idHi - idLo + 1L
    // chunk index closed-form over the FIXED union id space
    // [lo, lo + 2·halfSpan): originals fill chunks 0-1, replays 2-3 —
    // DuckDB replays the identical INTEGER division (`div` here, `//`
    // there; Column./ would be double division and shred the chunks)
    val chunkOfDocId: Column =
      expr(s"((doc_id - ${idLo}L) * 4L) div ${2L * halfSpan}L")
    ensureStaged((0 until chunks).map(c => s"$base/stage$c")) {
      val u = docs.select(col("doc_id"), col("text"))
        .unionByName(docs.filter(pmod(col("doc_id"), lit(7L)) === 3L)
          .select((col("doc_id") + off).as("doc_id"), col("text")))
      (0 until chunks).foreach { c =>
        graft.sources.TarShards.writeShards(
          u.filter(chunkOfDocId === c.toLong)
            .select(lit(0).as("shard_id"),
              concat(col("doc_id").cast("string"), lit(".txt")).as("name"),
              encode(col("text"), "UTF-8").as("content")),
          s"$base/stage$c", nShards = 1)
        // writeShards has no _SUCCESS convention; ensureStaged keys on it
        Files.createFile(Paths.get(s"$base/stage$c/_SUCCESS")): Unit
      }
    }
    val ss = streamSession(spark, shufflePartitions = 4)
    val q = ShardPipeline.reshardDeduped(ss, s"$base/in", s"$base/out",
      s"$base/ckpt", nShards)
    try {
      (0 until chunks).foreach { c =>
        landChunk(s"$base/stage$c", s"$base/tmp", s"$base/in", s"chunk$c",
          fileFilter = _.endsWith(".tar"))
        q.processAllAvailable()
      }
      requireMultiBatch(q, 2) // cross-batch dedup must be genuinely probed
    } finally q.stop()
    // read the OUTPUT shards back, one row per batch dir in landing
    // (= batch-id) order; empty batches wrote no dir, by the pipeline's
    // isEmpty guard — their absence IS the cross-batch dedup proof
    val batchDirs = {
      val ls = Files.list(Paths.get(s"$base/out"))
      try ls.iterator().asScala.toList finally ls.close()
    }.map(_.getFileName.toString).filter(_.startsWith("batch-"))
      .sortBy(_.stripPrefix("batch-").toLong)
    require(batchDirs.nonEmpty, "reshard pipeline produced no output shards")
    batchDirs.zipWithIndex.map { case (d, r) =>
      spark.read.format("graft.sources.TarDataSource").load(s"$base/out/$d")
        .agg(count(lit(1)).as("n_docs"), sum(col("size")).as("total_bytes"),
          bit_xor(graft.operators.TextOps.portableHash64(col("content")))
            .as("content_hash"))
        .select(lit(r.toLong).as("batch"), col("n_docs"),
          col("total_bytes"), col("content_hash"))
    }.reduce(_ unionByName _)
  }
}
