package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Layout, TextOps}
import graft.sources.Tables

/** Storage-layout evidence for the 100 TB story: bucketed tables make the
  * repeated big–big equi-join shuffle-FREE (the co-location the brief's
  * "pre-partitioning" rule asks for). Partition pruning is covered in
  * TablesSpec. */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("z-order layout: a (user, time) box query touches fewer files than a time-sorted layout") {
    import spark.implicits._
    val zed = Layout.eventsZOrdered(Tables.events(spark, dir))
    // invariant: the key really is the Morton interleave (JVM-side replay)
    zed.limit(200).collect().foreach { r =>
      val u = r.getAs[Long]("user_id") & 0xFFFFF
      val m = r.getAs[Long]("minute_key") & 0xFFFFF
      var expect = 0L
      (0 until 20).foreach { i =>
        expect |= ((u >> i) & 1L) << (2 * i)
        expect |= ((m >> i) & 1L) << (2 * i + 1)
      }
      assert(r.getAs[Long]("zkey") == expect)
    }

    // Locality, measured deterministically on a balanced 128×128 grid (the
    // real events corpus has 4 user bits vs 16 minute bits — z-order
    // locality presupposes comparably-scaled coordinates, which a
    // compaction job gets by normalizing; the grid isolates the layout
    // property). Write the same 16384 rows under three sort orders into
    // 16 files of 1024 rows; a 32×32 box query then counts the files that
    // CONTAIN matches — the I/O-clustering measure min/max file skipping
    // follows.
    val grid = spark.range(128L * 128L)
      .select(($"id" / 128).cast("long").as("u"), ($"id" % 128).as("m"))
      .withColumn("z", Layout.zorderKey($"u", $"m", 7))
    val base = java.nio.file.Files.createTempDirectory("graft-zorder")
    def filesWithMatches(sortKey: String, name: String): Long = {
      val path = s"$base/$name"
      grid.coalesce(1).sortWithinPartitions(sortKey)
        .write.option("maxRecordsPerFile", 1024L).parquet(path)
      spark.read.parquet(path)
        .filter($"u".between(32, 63) && $"m".between(32, 63))
        .select(input_file_name()).distinct().count()
    }
    val zFiles = filesWithMatches("z", "bz")
    val uFiles = filesWithMatches("u", "bu")
    val mFiles = filesWithMatches("m", "bm")
    // the aligned box is one contiguous z-range (top four z bits fixed) —
    // at most 2 files across a boundary; either single-column sort smears
    // it across the whole 1/4 stripe (4 files)
    assert(zFiles <= 2, s"z-order box touched $zFiles files")
    assert(zFiles < uFiles && zFiles < mFiles,
      s"no locality win: z=$zFiles u=$uFiles m=$mFiles")
  }

  test("hilbert key: bijective, unit-step adjacent (the property Morton lacks), codegen'd") {
    import spark.implicits._
    import graft.functions.HilbertUtil.xy2d
    // exhaustive on a 64x64 grid: the walk is a bijection onto [0, 4096)
    // and CONSECUTIVE curve positions are ALWAYS edge-adjacent cells —
    // Morton violates this at every power-of-two seam (e.g. z=2^k-1 ->
    // 2^k jumps both coordinates); this adjacency is exactly why a
    // Hilbert key range covers a tighter rectangle of files
    val bits = 6
    val n = 1 << bits
    val cellOf = Array.fill(n * n)(-1)
    for (x <- 0 until n; y <- 0 until n) {
      val d = xy2d(bits, x.toLong, y.toLong).toInt
      assert(d >= 0 && d < n * n && cellOf(d) == -1, s"collision at d=$d")
      cellOf(d) = x * n + y
    }
    (1 until n * n).foreach { d =>
      val (x0, y0) = (cellOf(d - 1) / n, cellOf(d - 1) % n)
      val (x1, y1) = (cellOf(d) / n, cellOf(d) % n)
      assert(math.abs(x0 - x1) + math.abs(y0 - y1) == 1,
        s"non-adjacent step at d=$d: ($x0,$y0) -> ($x1,$y1)")
    }
    // Morton, for contrast, takes a max step of n-1+n = far (documented
    // seam jump) — pin ONE such seam so the claim above stays honest
    def morton(x: Long, y: Long): Long =
      (0 until bits).foldLeft(0L)((a, i) =>
        a | ((x >> i) & 1L) << (2 * i) | ((y >> i) & 1L) << (2 * i + 1))
    val inv = (0 until n * n).map(d => (0 until n * n).collectFirst {
      case c if morton((c / n).toLong, (c % n).toLong) == d => c }.get)
    val seam = (1 until n * n).map { d =>
      val (a, b) = (inv(d - 1), inv(d))
      math.abs(a / n - b / n) + math.abs(a % n - b % n)
    }.max
    assert(seam > 1, "expected Morton to take a seam jump somewhere")

    // the native expression agrees with the kernel, masks negative inputs
    // two's-complement-style (DuckDB & parity), and stays inside
    // whole-stage codegen (no CodegenFallback row in the plan)
    // spark.range (not a local Seq) so ConvertToLocalRelation can't
    // constant-fold the expression away before the plan check below
    val df = spark.range(3)
      .select(
        when($"id" === 0, 5L).when($"id" === 1, -1L).otherwise(1L << 25).as("a"),
        when($"id" === 0, 9L).when($"id" === 1, 3L).otherwise(7L).as("b"))
      .withColumn("h", graft.functions.Hilbert.hilbertKeyNative($"a", $"b", 20))
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (a, b, h) => assert(h == xy2d(20, a, b)) }
    // codegen stages print as "*(n) Operator": the Project evaluating
    // hilbertkey must be starred (inside whole-stage codegen)
    val plan = df.queryExecution.executedPlan.toString
    val hLine = plan.linesIterator.find(_.contains("hilbertkey")).get
    assert(hLine.trim.startsWith("*("), plan)
    // and the driver query carries it end-to-end on real events
    val he = Layout.eventsHilbert(Tables.events(spark, dir))
    he.limit(100).collect().foreach { r =>
      assert(r.getAs[Long]("hkey") ==
        xy2d(20, r.getAs[Long]("user_id"), r.getAs[Long]("minute_key")))
    }
  }

  test("hash shards are balanced and the manifest totals reconcile") {
    val docs = Tables.documents(spark, dir)
    val manifest = TextOps.shardManifest(docs, numShards = 16).collect()
    val total = manifest.map(_.getAs[Long]("n_docs")).sum
    assert(total == docs.count())
    // content-stable hash sharding: no empty shard, max/avg bounded (the
    // balance a loader relies on to plan even reads)
    val counts = manifest.map(_.getAs[Long]("n_docs"))
    assert(counts.length == 16)
    val avg = total.toDouble / counts.length
    assert(counts.max <= avg * 2.0,
      s"skewed shards: max ${counts.max} vs avg $avg")
    assert(counts.min >= 1L)
  }

  test("compaction plan: FFD bins respect the target, oversized pass through, deterministic") {
    import spark.implicits._
    // scatter real rows into many small parquet files
    val out = java.nio.file.Files.createTempDirectory("graft-compact")
    Tables.events(spark, dir).repartition(24)
      .write.mode("overwrite").parquet(out.toString)
    val listed = new java.io.File(out.toString).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.length).toMap
    assert(listed.size > 10, s"expected many small files, got ${listed.size}")
    val target = listed.values.sum / 4 // force ~4+ groups
    val plan = Layout.compactionPlan(spark, out.toString, target).collect()
      .map(r => (r.getAs[String]("file"), r.getAs[Long]("bytes"),
        r.getAs[Long]("group_id")))
    // covers every file exactly once, sizes faithful
    assert(plan.map(_._1).toSet == listed.keySet && plan.length == listed.size)
    plan.foreach { case (f, b, _) => assert(listed(f) == b) }
    // every multi-file group's total respects the target; singleton groups
    // may be oversized files passing through
    plan.groupBy(_._3).foreach { case (g, fs) =>
      if (fs.length > 1)
        assert(fs.map(_._2).sum <= target, s"group $g overflows")
    }
    // compaction actually compacts: fewer groups than files
    assert(plan.map(_._3).distinct.length < listed.size)
    // deterministic across invocations
    val again = Layout.compactionPlan(spark, out.toString, target).collect()
      .map(r => (r.getAs[String]("file"), r.getAs[Long]("bytes"),
        r.getAs[Long]("group_id")))
    assert(plan.toSeq == again.toSeq)
    // and the rewrite semantics hold: reading one group's files returns
    // exactly those files' rows (compaction never mixes or drops)
    val g0 = plan.filter(_._3 == 0L).map(_._1)
    val g0Rows = spark.read.parquet(g0.map(f => s"$out/$f"): _*).count()
    assert(g0Rows > 0)
  }

  test("compaction executor: directory converges to the planned file count with identical rows") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-compact-exec")
    Tables.events(spark, dir).repartition(24)
      .write.mode("overwrite").parquet(out.toString)
    def parquetFiles() = new java.io.File(out.toString).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).map(_.getName).sorted
    val before = parquetFiles()
    assert(before.length > 10)
    // content fingerprint that survives arbitrary row re-ordering
    def fingerprint(): (Long, java.math.BigDecimal) = {
      val df = spark.read.parquet(out.toString)
      val r = df.agg(count(lit(1)),
        sum(xxhash64(df.columns.map(col): _*).cast("decimal(38,0)"))).head()
      (r.getLong(0), r.getDecimal(1))
    }
    val fpBefore = fingerprint()
    val target = new java.io.File(out.toString).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum / 4
    val plannedGroups = Layout.compactionPlan(spark, out.toString, target)
      .select("group_id").distinct().count()
    val summary = Layout.executeCompaction(spark, out.toString, target).collect()
    // one output file per group, every multi-file group rewritten
    assert(summary.length == plannedGroups)
    assert(summary.forall(r => r.getAs[String]("action") != "resumed"))
    assert(summary.exists(_.getAs[String]("action") == "rewritten"))
    val after = parquetFiles()
    assert(after.length.toLong == plannedGroups,
      s"expected $plannedGroups files after compaction, found ${after.length}")
    assert(after.length < before.length)
    // rows and content identical; plan + tmp areas retired
    assert(fingerprint() == fpBefore)
    assert(!new java.io.File(s"$out/_compact_plan").exists())
    assert(!new java.io.File(s"$out/_compact_tmp").exists())
  }

  test("compaction executor: restart after a crash mid-protocol converges without loss or duplication") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-compact-crash")
    Tables.events(spark, dir).repartition(24)
      .write.mode("overwrite").parquet(out.toString)
    def fingerprint(): (Long, java.math.BigDecimal) = {
      val df = spark.read.parquet(out.toString)
      val r = df.agg(count(lit(1)),
        sum(xxhash64(df.columns.map(col): _*).cast("decimal(38,0)"))).head()
      (r.getLong(0), r.getDecimal(1))
    }
    val fpBefore = fingerprint()
    val target = new java.io.File(out.toString).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum / 4
    // simulate the worst crash window BY HAND: persist the plan, fully land
    // ONE group's output file, but die before deleting its sources
    val plan = Layout.compactionPlan(spark, out.toString, target)
    plan.coalesce(1).write.mode("overwrite").parquet(s"$out/_compact_plan")
    val groups = plan.collect()
      .map(r => (r.getAs[Long]("group_id"), r.getAs[String]("file")))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val victim = groups.collectFirst { case (g, fs) if fs.length > 1 => (g, fs) }.get
    val outName = Layout.compactOutName(victim._2)
    spark.read.parquet(victim._2.map(f => s"$out/$f"): _*)
      .coalesce(1).write.parquet(s"$out/_hand_tmp")
    val part = new java.io.File(s"$out/_hand_tmp").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    assert(part.renameTo(new java.io.File(s"$out/$outName")))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$out/_hand_tmp"))
    // sources still present alongside the landed output: rows are briefly
    // duplicated on disk — exactly what the resume protocol must fix
    // (restart): the executor must detect the landed group, replay only its
    // deletes, rewrite the rest, and end bit-identical to a clean run
    val summary = Layout.executeCompaction(spark, out.toString, target).collect()
    val resumed = summary.filter(_.getAs[String]("action") == "resumed")
    assert(resumed.length == 1 && resumed.head.getAs[String]("out_file") == outName)
    assert(fingerprint() == fpBefore)
    val files = new java.io.File(out.toString).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(files.length == summary.length)
  }

  test("runtime bloom-filter pushdown: a selective dim filter row-filters the fact scan") {
    import spark.implicits._
    // the 100 TB lever this pins: when a dimension side carries a selective
    // predicate and the join is too big to broadcast, Catalyst injects a
    // runtime bloom filter on the fact side's join key — rows that cannot
    // match are dropped AT THE SCAN, before the shuffle. Local thresholds
    // are tuned for clusters (10 GB application side), so the spec lowers
    // them to demonstrate the mechanism on testdata.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    ).map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // no broadcast: the bloom case
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      val orders = Tables.orders(spark, dir)
      val customer = Tables.customer(spark, dir)
        .filter($"c_mktsegment" === "BUILDING") // the selective creation side
      val joined = orders.join(customer, $"o_custkey" === $"c_custkey")
        .select($"o_orderkey", $"c_name")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain") && plan.contains("bloom_filter_agg"),
        s"no runtime bloom filter injected:\n${plan.linesIterator.take(40).mkString("\n")}")
      // and the filter is transparent: same result as with it disabled
      val n = joined.count()
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      assert(n == orders.join(customer, $"o_custkey" === $"c_custkey").count())
      assert(n > 0)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("bucketed tables join with zero Exchange (co-located sort-merge join)") {
    import spark.implicits._
    val conf = spark.conf
    val savedThreshold = conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    val wh = java.nio.file.Files.createTempDirectory("graft-buckets")
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the SMJ path
      // both sides bucketed AND sorted on the join key into 8 buckets:
      // the join then reads bucket i against bucket i — no Exchange, no
      // extra Sort, the exact layout a nightly 100 TB fact⋈fact job
      // amortizes over every downstream run
      Layout.writeBucketed(Tables.orders(spark, dir), "orders_b",
        "o_custkey", 8, Some(s"$wh/orders_b"))
      Layout.writeBucketed(Tables.customer(spark, dir), "customer_b",
        "c_custkey", 8, Some(s"$wh/customer_b"))

      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"), $"o_custkey" === $"c_custkey")
        .select($"o_orderkey", $"c_name")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("SortMergeJoin"), plan)
      // and it computes the same thing as the plain join
      val expect = Tables.orders(spark, dir)
        .join(Tables.customer(spark, dir), $"o_custkey" === $"c_custkey")
        .count()
      assert(joined.count() == expect)

      // aggregation co-location: a groupBy on the bucket key needs
      // hashpartitioning(key) — the bucketed scan already provides it, so
      // the partial+final agg pair collapses to ONE stage, no Exchange.
      // At 100 TB this is the difference between a full-fact shuffle per
      // rollup and none.
      val agg = spark.table("orders_b")
        .groupBy($"o_custkey").agg(org.apache.spark.sql.functions.sum($"o_totalprice"))
      val aggPlan = agg.queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange"), s"bucketed agg still shuffles:\n$aggPlan")
      val aggExpect = Tables.orders(spark, dir).select($"o_custkey").distinct().count()
      assert(agg.count() == aggExpect)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
      savedThreshold match {
        case Some(v) => conf.set("spark.sql.autoBroadcastJoinThreshold", v)
        case None => conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    }
  }
}
