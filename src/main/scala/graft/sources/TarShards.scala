package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WebDataset-style shard SINK + the shard round-trip proof queries.
  *
  * `writeShards` packs (shard_id, name, content) rows into one `.tar` file
  * per shard id. The layout move is the whole design: `repartition(n,
  * shard_id)` puts every row of a shard id into exactly one task (several
  * shard ids may share a task — fine, they are written sequentially after
  * a within-partition sort), so each shard file has exactly one writer and
  * no coordination. At 100 TB this is the standard "pack training samples
  * into shards" job: one shuffle by shard id, then embarrassingly parallel
  * sequential writes — the same shape Spark's own file committers use.
  *
  * Writers stream row-by-row (one member buffered at a time), so task
  * memory is O(largest member) — and they write under an IN-PROGRESS name
  * (`shard-XXXXX.tar.inprogress-<attempt>`), renaming to `.tar` only after
  * the trailer is flushed. Readers and the streaming source list `.tar`
  * files only, so a shard is either absent or complete — the immutability
  * contract [[TarMicroBatchStream]] depends on — and speculative duplicate
  * attempts collide on the rename, not on the bytes (first rename wins,
  * the loser's temp file is deleted; both attempts wrote identical
  * content, so either outcome is correct).
  */
object TarShards {

  /** Pack rows into `outDir/shard-%05d.tar`. Input must have columns
    * (shard_id int, name string, content binary); rows are written in
    * (shard_id, name) order, so shard bytes are deterministic. */
  def writeShards(packed: DataFrame, outDir: String, nShards: Int): Unit = {
    val serConf = TarTable.sessionConf()
    val out = new Path(outDir)
    val fs = out.getFileSystem(serConf.value)
    fs.delete(out, true)
    fs.mkdirs(out)
    packed
      .select(col("shard_id").cast("int"), col("name"), col("content"))
      .repartition(nShards, col("shard_id"))
      .sortWithinPartitions(col("shard_id"), col("name"))
      .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        val conf = serConf.value
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId()).getOrElse(0L)
        var currentShard = -1
        var stream: java.io.OutputStream = null
        var tmpPath: Path = null
        var finalPath: Path = null
        def closeShard(): Unit = if (stream != null) {
          TarIO.writeTrailer(stream)
          stream.close(); stream = null
          val pfs = finalPath.getFileSystem(conf)
          // atomic publish; a lost race means a twin attempt already
          // published identical bytes — drop ours
          if (!pfs.rename(tmpPath, finalPath)) {
            require(pfs.exists(finalPath),
              s"rename $tmpPath -> $finalPath failed with no winner")
            pfs.delete(tmpPath, false)
          }
        }
        rows.foreach { r =>
          val sid = r.getInt(0)
          if (sid != currentShard) {
            closeShard()
            currentShard = sid
            finalPath = new Path(outDir, f"shard-$sid%05d.tar")
            tmpPath = new Path(outDir, f"shard-$sid%05d.tar.inprogress-$attempt")
            val pfs = tmpPath.getFileSystem(conf)
            pfs.setWriteChecksum(false) // no .crc sidecars next to shards
            stream = new java.io.BufferedOutputStream(pfs.create(tmpPath, true))
          }
          TarIO.writeMember(stream, r.getString(1), r.getAs[Array[Byte]](2))
        }
        closeShard()
      }
    // DRIVER-SIDE post-job janitor for dead attempts' temp files: a task
    // that died mid-write leaves shard-XXXXX.tar.inprogress-<attempt>
    // behind (its retry publishes under a NEW attempt id and cannot
    // safely delete a sibling that might belong to a LIVE speculative
    // twin — an in-task reap either races an open HDFS lease or, if
    // age-gated, never fires because retries land within seconds). Here
    // the job has COMPLETED: no task of it is still writing, so sweeping
    // every leftover .inprogress file is race-free. Readers ignore
    // non-.tar names throughout, so this is dir hygiene, not
    // correctness; a crash before this sweep leaves orphans that the
    // next writeShards run's dir wipe removes.
    val leftovers = fs.globStatus(new Path(out, "*.inprogress-*"))
    if (leftovers != null)
      leftovers.foreach(o => fs.delete(o.getPath, false))
  }

  /** WebDataset SAMPLE GROUPING: members named `<key>.<ext>` are the
    * fields of one logical sample (img.jpg + img.cls + img.json …), and
    * training wants the sample as ONE row. Input is the connector's
    * (shard, name, size, content) shape; output is one row per key with
    * a binary column per requested extension (null when the member is
    * absent — callers decide whether that is an error).
    *
    * One hash aggregation on the sample key — conditional `max(when)`
    * per extension, so members collapse map-side and no join or pivot
    * shuffle appears. Samples are whole within their shard by the
    * WebDataset contract, so the key agg is shard-local data that a
    * 100 TB run could even pre-aggregate per partition; the global
    * shuffle only carries one slim row per sample. */
  def samples(members: DataFrame, exts: Seq[String]): DataFrame = {
    require(exts.nonEmpty, "sample grouping needs at least one extension")
    // fail-loudly contract: a member name with no '.' has no sample key
    // (regexp_extract would return "" and silently merge all such
    // members into one bogus sample, dropping their content) — raise
    // instead, at row level, so external tars violating the WebDataset
    // naming convention surface as an error, not corrupt samples
    val checkedName = when(col("name").contains("."), col("name"))
      .otherwise(raise_error(concat(
        lit("TarShards.samples: member name without '.' carries no sample key: "),
        col("name"))))
    val key = regexp_extract(checkedName, "^([^.]*)\\.", 1)
    val ext = regexp_extract(checkedName, "^[^.]*\\.(.*)$", 1)
    val aggs = exts.map(e => max(when(col("ext") === e, col("content"))).as(e))
    members
      .select(key.as("key"), ext.as("ext"), col("content"))
      .groupBy(col("key"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** The round-trip proof, as ONE self-contained driver query: pack the
    * document corpus into `nShards` tar shards (doc_id-keyed, so the
    * layout is reproducible), read the directory back through the
    * [[TarDataSource]] connector, and aggregate per shard — member count,
    * total payload bytes (from tar HEADERS, so a size-field corruption
    * would flip the hash), and an order-independent XOR of the
    * engine-portable content hashes. The DuckDB oracle computes the same
    * three aggregates from `documents` directly: a hash match proves
    * write → tar bytes → connector read is lossless end to end.
    * Null-text documents are excluded on BOTH sides (a tar member cannot
    * carry a null payload — absence is the WebDataset convention). */
  def roundTrip(spark: SparkSession, documents: DataFrame,
                nShards: Int): DataFrame = {
    val dir = shardDir(documents)
    val packed = documents
      .filter(col("text").isNotNull)
      .select(
        pmod(col("doc_id"), lit(nShards)).cast("int").as("shard_id"),
        concat(col("doc_id").cast("string"), lit(".txt")).as("name"),
        encode(col("text"), "UTF-8").as("content"))
    writeShards(packed, dir, nShards)
    spark.read.format("graft.sources.TarDataSource").load(dir)
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("size")).as("total_bytes"),
        // XOR, not SUM: order-independent and overflow-free under ANSI
        bit_xor(graft.operators.TextOps.portableHash64(col("content")))
          .as("content_hash"))
  }

  /** Compressed round-trip proof — [[roundTrip]] through per-member gzip
    * (WebDataset's `.gz` member convention): pack every document as
    * `<id>.txt.gz` with a gzipped payload, read the shards back with the
    * connector's `inflate` option, and aggregate member count, DECODED
    * byte total, and the order-independent XOR of decoded-content hashes.
    * The oracle is the SAME closed form as wds_roundtrip's (aggregates
    * over `documents` directly): a hash match proves
    * text → gzip → tar → connector-inflate is lossless, and that `size`
    * under inflate reports decoded (not header) lengths. The gzip step is
    * a narrow typed map (per-row, no shuffle); compression happens where
    * the rows already are. */
  def gzipRoundTrip(spark: SparkSession, documents: DataFrame,
                    nShards: Int): DataFrame = {
    import spark.implicits._
    val dir = shardDir(documents) + "_gz"
    val packed = documents
      .filter(col("text").isNotNull)
      .select(
        pmod(col("doc_id"), lit(nShards)).cast("int").as("shard_id"),
        concat(col("doc_id").cast("string"), lit(".txt.gz")).as("name"),
        col("text"))
      .as[(Int, String, String)]
      .map { case (sid, name, text) =>
        (sid, name, TarIO.gzip(text.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      }
      .toDF("shard_id", "name", "content")
    writeShards(packed, dir, nShards)
    spark.read.format("graft.sources.TarDataSource")
      .option("inflate", "true").load(dir)
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("size")).as("total_bytes"),
        bit_xor(graft.operators.TextOps.portableHash64(col("content")))
          .as("content_hash"))
  }

  /** Multi-member round-trip proof: pack TWO members per document
    * (`<id>.txt` = text, `<id>.meta` = language tag), read the shards
    * back, reassemble samples with [[samples]], and aggregate per
    * decoded language — count + order-independent XOR of the portable
    * text hash. The oracle computes the same from `documents` directly,
    * so the hash match proves sample reassembly pairs the right members
    * (a txt/meta mix-up between docs flips the XOR). */
  def sampleRoundTrip(spark: SparkSession, documents: DataFrame,
                      nShards: Int): DataFrame = {
    val dir = shardDir(documents) + "_samples"
    val base = documents.filter(col("text").isNotNull && col("lang").isNotNull)
    val txt = base.select(
      pmod(col("doc_id"), lit(nShards)).cast("int").as("shard_id"),
      concat(col("doc_id").cast("string"), lit(".txt")).as("name"),
      encode(col("text"), "UTF-8").as("content"))
    val meta = base.select(
      pmod(col("doc_id"), lit(nShards)).cast("int").as("shard_id"),
      concat(col("doc_id").cast("string"), lit(".meta")).as("name"),
      encode(col("lang"), "UTF-8").as("content"))
    writeShards(txt.unionByName(meta), dir, nShards)
    val back = spark.read.format("graft.sources.TarDataSource").load(dir)
    samples(back, Seq("txt", "meta"))
      .select(decode(col("meta"), "UTF-8").as("lang"),
        graft.operators.TextOps.portableHash64(col("txt")).as("h"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), bit_xor(col("h")).as("text_hash"))
  }

  /** Shard FSCK — the validation sweep a landing directory needs before
    * shards enter training: one row per `.tar` file with the full-walk
    * verdict (header checksums, member structure, end-of-archive marker
    * all verified by [[TarIO.read]]'s loud contract, payloads skipped —
    * this is a METADATA-ONLY pass). The connector itself fails loudly on
    * corruption by design; this operator is the complement that turns
    * "which shards would fail?" into a queryable table instead of a
    * dead executor. One task per shard, no shuffle. */
  def fsck(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val serConf = TarTable.sessionConf()
    val shards = TarScan
      .listShards(dir, Array.empty, serConf.value)
      .map(s => (s.path, s.shard, s.len)).toSeq
    spark.createDataset(shards)
      .repartition(math.max(1, math.min(shards.size, 64)))
      .map { case (path, shard, len) =>
        // open() sits INSIDE the try: a shard deleted between listing and
        // task execution becomes an error ROW, not a dead job — which is
        // this operator's whole contract
        var in: java.io.InputStream = null
        try {
          val p = new org.apache.hadoop.fs.Path(path)
          in = p.getFileSystem(serConf.value).open(p)
          var members = 0L
          var bytes = 0L
          TarIO.read(in, readBytes = false).foreach { m =>
            members += 1; bytes += m.size
          }
          (shard, len, true, members, bytes, null: String)
        } catch {
          case e: Exception =>
            (shard, len, false, -1L, -1L, s"${e.getClass.getSimpleName}: ${e.getMessage}")
        } finally if (in != null) in.close()
      }
      .toDF("shard", "file_bytes", "ok", "n_members", "payload_bytes", "error")
  }

  /** Driver query: pack the corpus (the [[roundTrip]] layout) and fsck
    * the result. Every column is closed-form from the documents table —
    * tar arithmetic included: a member costs 512 header bytes plus its
    * payload padded to 512, a shard ends with the 1024-byte marker — so
    * the oracle recomputes file sizes byte-exactly, and any header/
    * padding/trailer drift in the writer flips the hash. */
  def fsckQuery(spark: SparkSession, documents: DataFrame,
                nShards: Int): DataFrame = {
    val dir = shardDir(documents) + "_fsck"
    val packed = documents
      .filter(col("text").isNotNull)
      .select(
        pmod(col("doc_id"), lit(nShards)).cast("int").as("shard_id"),
        concat(col("doc_id").cast("string"), lit(".txt")).as("name"),
        encode(col("text"), "UTF-8").as("content"))
    writeShards(packed, dir, nShards)
    fsck(spark, dir)
  }

  /** Shard-stats audit through the connector's AGGREGATE pushdown: pack
    * the corpus, then compute per-shard member count and size stats with
    * a plan whose scan IS the aggregate — readers walk 512-byte headers
    * and seek past every payload, shipping one pre-aggregated row per
    * shard (TarScanBuilder.pushAggregation). The closed-form DuckDB
    * oracle recomputes all four stats from `documents`, so a header
    * size-field corruption, a dropped member, or an aggregation-pushdown
    * bug all flip the hash. This is the 100 TB fleet-audit query shape:
    * touch metadata, never payload, output rows = shard count. */
  def shardStats(spark: SparkSession, documents: DataFrame,
                 nShards: Int): DataFrame = {
    val dir = shardDir(documents) + "_stats"
    val packed = documents
      .filter(col("text").isNotNull)
      .select(
        pmod(col("doc_id"), lit(nShards)).cast("int").as("shard_id"),
        concat(col("doc_id").cast("string"), lit(".txt")).as("name"),
        encode(col("text"), "UTF-8").as("content"))
    writeShards(packed, dir, nShards)
    spark.read.format("graft-tar").load(dir)
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_members"),
        sum(col("size")).as("total_bytes"),
        min(col("size")).as("min_bytes"),
        max(col("size")).as("max_bytes"))
  }

  /** Scratch dir keyed by the input's first file path, so concurrent runs
    * on different scale factors never collide. */
  private def shardDir(documents: DataFrame): String = {
    val key = java.lang.Long.toHexString(
      documents.inputFiles.sorted.headOption.getOrElse("mem").hashCode.toLong & 0xffffffffL)
    s"/tmp/graft_wds_$key"
  }
}
