package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Storage-layout operators for scan locality at 100 TB: a z-order
  * (Morton) clustering key, so data sorted by ONE key is simultaneously
  * clustered in TWO dimensions. A range predicate on either — or a box on
  * both — then touches a small fraction of files, and parquet min/max
  * stats prune the rest (LayoutSpec measures the effect against a
  * single-column sort on real data).
  *
  * All integer bit arithmetic: bit-exact in any engine, hash-oracle-safe.
  */
object Layout {

  /** Morton interleave of the low `bits` bits of two non-negative integer
    * columns: bit i of `a` lands at result bit 2i, bit i of `b` at 2i+1.
    * A fold of shift/and/or column expressions — whole-stage codegen
    * compiles it to straight-line long arithmetic (2·bits ops per row, no
    * UDF, no allocation). `bits` ≤ 31 keeps the result in a positive long.
    */
  def zorderKey(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val mask = (1L << bits) - 1
    val ma = a.bitwiseAND(lit(mask))
    val mb = b.bitwiseAND(lit(mask))
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(ma, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(mb, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** Minutes since 2024-01-01T00:00Z — the normalized time coordinate for
    * event z-ordering (raw epoch minutes need ~26 bits; anchoring to the
    * corpus epoch keeps the 20-bit key good for ≈ 2 years FROM THE DATA'S
    * START, so the mask never wraps on in-range data — the events corpus
    * begins 2024-01). 1704067200 s / 60. Single-sourced: the DuckDB
    * zorder oracle interpolates this constant. */
  private[graft] val anchorMinute = 28401120L

  /** `events` with its z-order clustering key over
    * (user_id, minutes-since-2020): the layout a periodic compaction job
    * sorts by, so both per-user scans and time-range scans stay file-local.
    * Narrow per-row expressions only — at 100 TB the cost is the sort the
    * writer was already paying, not this key.
    */
  def eventsZOrdered(events: DataFrame, bits: Int = 20): DataFrame =
    events.select(
      col("event_id"),
      col("user_id"),
      (floor(unix_timestamp(col("ts")) / lit(60)).cast("long") - anchorMinute)
        .as("minute_key"))
      .withColumn("zkey", zorderKey(col("user_id"), col("minute_key"), bits))

  /** Bucketed-table write — THE co-location primitive this codebase's
    * scale notes keep invoking (semantic-dedup's cluster_id layout,
    * IVF-PQ's anchor_id layout, merge-upsert's key buckets): hash-bucket
    * the rows by `key` into `numBuckets` files per partition, each
    * sorted by `key`. A later join or aggregation on `key` between
    * tables bucketed the same way satisfies the required hash
    * distribution AT THE SCAN — Catalyst plans it with ZERO Exchange
    * (and zero sort, for the join): the shuffle that dominates a 100 TB
    * job is paid once at write time, then never again across every
    * downstream consumer. LayoutSpec asserts both the join and the
    * aggregation plan Exchange-free against a live bucketed table.
    *
    * Spark's bucketing rides the table catalog (`saveAsTable`) — the
    * bucket spec lives in table metadata, which is what the scan-side
    * planner reads; a bare parquet path write cannot carry it.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    numBuckets: Int, path: Option[String] = None): Unit = {
    val base = df.write
      .format("parquet")
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .mode("overwrite")
    path.fold(base)(p => base.option("path", p)).saveAsTable(table)
  }

  /** Compaction plan for a directory of parquet files — the small-files
    * answer every long-running 100 TB table needs (streaming sinks and
    * per-task writers leave thousands of KB-scale files; each costs a
    * namenode entry, a footer read, and a task per scan). The plan is
    * DRIVER-SIDE FS METADATA ONLY (file name + size from one directory
    * listing — the [[graft.sources.Tables.parquetRowCount]] discipline: no
    * data is read to decide), packed first-fit-decreasing into
    * `targetBytes` output groups. The executor-side rewrite is then one
    * `spark.read.parquet(filesOfGroup).coalesce(1).write` per group — each
    * group an independent job, trivially parallel, restartable per group.
    *
    * Properties (spec-pinned): every group's total ≤ targetBytes unless it
    * holds a single oversized file (which compaction cannot split — it
    * passes through alone); already-large-enough files (> half target)
    * keep their own group rather than riding along and re-writing bytes
    * for nothing; the plan is deterministic (sizes desc, then name).
    */
  def compactionPlan(spark: org.apache.spark.sql.SparkSession, dir: String,
                     targetBytes: Long): DataFrame = {
    import org.apache.hadoop.fs.Path
    require(targetBytes > 0, "targetBytes must be positive")
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    val files = fs.listStatus(root).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => (s.getPath.getName, s.getLen))
      .sortBy { case (name, len) => (-len, name) } // FFD, name-stable
    // groups: (id, remaining); big files (> target/2) pass through alone
    val assigned = scala.collection.mutable.ArrayBuffer[(String, Long, Long)]()
    val open = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    var nextGroup = 0L
    files.foreach { case (name, len) =>
      if (len > targetBytes / 2) {
        assigned += ((name, len, nextGroup)); nextGroup += 1
      } else {
        val slot = open.indexWhere(_._2 >= len)
        if (slot >= 0) {
          val (gid, rem) = open(slot)
          assigned += ((name, len, gid))
          open(slot) = (gid, rem - len)
        } else {
          assigned += ((name, len, nextGroup))
          open += ((nextGroup, targetBytes - len))
          nextGroup += 1
        }
      }
    }
    import spark.implicits._
    assigned.toSeq.toDF("file", "bytes", "group_id")
  }
}
