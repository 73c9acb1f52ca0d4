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

  /** `events` with its HILBERT clustering key over the same
    * (user_id, minutes-since-anchor) plane as [[eventsZOrdered]] — the
    * layout-key alternative a compaction job picks when 2-D range scans
    * dominate: the Hilbert curve has no power-of-two seam jumps, so an
    * equal-length key range covers a more compact rectangle than Morton
    * order (fewer files touched per scan). Same cost shape as the z-order
    * key: one narrow codegen'd per-row expression
    * ([[graft.functions.HilbertKey]]), paid inside the sort the compaction
    * writer already runs — nothing here shuffles.
    */
  def eventsHilbert(events: DataFrame, bits: Int = 20): DataFrame =
    events.select(
      col("event_id"),
      col("user_id"),
      (floor(unix_timestamp(col("ts")) / lit(60)).cast("long") - anchorMinute)
        .as("minute_key"))
      .withColumn("hkey", graft.functions.Hilbert.hilbertKeyNative(
        col("user_id"), col("minute_key"), bits))

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

  /** Deterministic output-file name for a compaction group — a content
    * address over the member file NAMES, so a restarted run recomputes the
    * identical name and can detect a group whose rewrite already landed. */
  private[graft] def compactOutName(files: Seq[String]): String = {
    val md = java.security.MessageDigest.getInstance("SHA-1")
    files.sorted.foreach(f => md.update((f + "\n").getBytes("UTF-8")))
    "compact-" + md.digest().map("%02x".format(_)).mkString.take(16) + ".parquet"
  }

  /** EXECUTE the [[compactionPlan]]: rewrite each multi-file group into one
    * parquet file, restartable per group. The protocol a 100 TB nightly
    * compactor needs, in miniature:
    *
    *  1. The plan is PERSISTED to `dir/_compact_plan` before any rewrite —
    *     a restart resumes the SAME plan (re-planning mid-flight would see
    *     half-compacted output and regroup differently).
    *  2. Each group's output name is a content address of its member names
    *     ([[compactOutName]]), so "did this group already land?" is one
    *     `fs.exists` — no journal.
    *  3. Per group: write to `dir/_compact_tmp/<out>`, atomically RENAME the
    *     part file to `dir/<out>`, then delete the sources. A crash before
    *     the rename leaves sources intact (tmp is garbage, re-created);
    *     a crash after it is detected by step 2 and only the leftover
    *     source deletes replay. No window loses or duplicates rows.
    *  4. Groups are independent jobs — a cluster runs them concurrently
    *     (each is its own read→write); this executor runs them in sequence
    *     for deterministic local testing.
    *
    * Singleton groups (oversized or already-big files) keep their file
    * untouched. Returns the per-group summary
    * `(group_id, files_in, bytes_in, out_file, action)` with action one of
    * `rewritten | kept | resumed`.
    */
  def executeCompaction(spark: org.apache.spark.sql.SparkSession, dir: String,
                        targetBytes: Long): DataFrame = {
    import org.apache.hadoop.fs.Path
    import spark.implicits._
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    val planPath = new Path(root, "_compact_plan")
    val tmpRoot = new Path(root, "_compact_tmp")

    // 1. persist-or-resume the plan
    val plan: Seq[(String, Long, Long)] =
      if (fs.exists(planPath)) {
        spark.read.parquet(planPath.toString)
          .select("file", "bytes", "group_id").as[(String, Long, Long)]
          .collect().toSeq
      } else {
        val p = compactionPlan(spark, dir, targetBytes)
        p.coalesce(1).write.mode("overwrite").parquet(planPath.toString)
        p.select("file", "bytes", "group_id").as[(String, Long, Long)]
          .collect().toSeq
      }

    val summary = plan.groupBy(_._3).toSeq.sortBy(_._1).map { case (gid, members) =>
      val names = members.map(_._1)
      val bytes = members.map(_._2).sum
      if (members.length == 1) {
        (gid, 1, bytes, names.head, "kept")
      } else {
        val outName = compactOutName(names)
        val outPath = new Path(root, outName)
        val action = if (fs.exists(outPath)) {
          // group already landed in a previous run — replay only the deletes
          names.foreach { n =>
            val src = new Path(root, n)
            if (fs.exists(src)) fs.delete(src, false)
          }
          "resumed"
        } else {
          val tmp = new Path(tmpRoot, outName)
          if (fs.exists(tmp)) fs.delete(tmp, true) // garbage from a crash
          spark.read.parquet(names.map(n => new Path(root, n).toString): _*)
            .coalesce(1).write.parquet(tmp.toString)
          val part = fs.listStatus(tmp).map(_.getPath)
            .find(_.getName.endsWith(".parquet"))
            .getOrElse(sys.error(s"compaction group $gid wrote no parquet part"))
          require(fs.rename(part, outPath),
            s"compaction: atomic rename $part -> $outPath failed")
          names.foreach(n => fs.delete(new Path(root, n), false))
          fs.delete(tmp, true)
          "rewritten"
        }
        (gid, members.length, bytes, outName, action)
      }
    }
    // 4. all groups landed — retire the plan and tmp area
    fs.delete(planPath, true)
    if (fs.exists(tmpRoot)) fs.delete(tmpRoot, true)
    summary.toDF("group_id", "files_in", "bytes_in", "out_file", "action")
  }
}
