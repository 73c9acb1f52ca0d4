package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WebDataset-style shard SINK + the shard round-trip proof query.
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
  * memory is O(largest member), not O(shard).
  */
object TarShards {

  /** Pack rows into `outDir/shard-%05d.tar`. Input must have columns
    * (shard_id int, name string, content binary); rows are written in
    * (shard_id, name) order, so shard bytes are deterministic. */
  def writeShards(packed: DataFrame, outDir: String, nShards: Int): Unit = {
    val out = new Path(outDir)
    val fs = out.getFileSystem(new Configuration())
    fs.delete(out, true)
    fs.mkdirs(out)
    packed
      .select(col("shard_id").cast("int"), col("name"), col("content"))
      .repartition(nShards, col("shard_id"))
      .sortWithinPartitions(col("shard_id"), col("name"))
      .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        val conf = new Configuration()
        var currentShard = -1
        var stream: java.io.OutputStream = null
        def closeShard(): Unit = if (stream != null) {
          TarIO.writeTrailer(stream)
          stream.close(); stream = null
        }
        rows.foreach { r =>
          val sid = r.getInt(0)
          if (sid != currentShard) {
            closeShard()
            currentShard = sid
            val p = new Path(outDir, f"shard-$sid%05d.tar")
            val pfs = p.getFileSystem(conf)
            pfs.setWriteChecksum(false) // no .crc sidecars next to shards
            stream = new java.io.BufferedOutputStream(pfs.create(p, true))
          }
          TarIO.writeMember(stream, r.getString(1), r.getAs[Array[Byte]](2))
        }
        closeShard()
      }
  }

  /** The round-trip proof, as ONE self-contained driver query: pack the
    * document corpus into `nShards` tar shards (doc_id-keyed, so the
    * layout is reproducible), read the directory back through the
    * [[TarDataSource]] connector, and aggregate per shard — member count,
    * total payload bytes (from tar HEADERS, so a size-field corruption
    * would flip the hash), and an order-independent XOR of the
    * engine-portable content hashes. The DuckDB oracle computes the same
    * three aggregates from `documents` directly: a hash match proves
    * write → tar bytes → connector read is lossless end to end. */
  def roundTrip(spark: SparkSession, documents: DataFrame,
                nShards: Int): DataFrame = {
    val dir = shardDir(documents)
    val packed = documents
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

  /** Scratch dir keyed by the input's first file path, so concurrent runs
    * on different scale factors never collide. */
  private def shardDir(documents: DataFrame): String = {
    val key = java.lang.Long.toHexString(
      documents.inputFiles.sorted.headOption.getOrElse("mem").hashCode.toLong & 0xffffffffL)
    s"/tmp/graft_wds_$key"
  }
}
