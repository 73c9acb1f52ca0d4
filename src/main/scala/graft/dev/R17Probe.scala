package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe (round-17): stage-level timing of the shared near-dup
  * machinery and the composed curation chain at bench scale/config —
  * which stage of each expensive query actually owns the wall.
  * Usage: runMain graft.dev.R17Probe <mode> [sfDir]
  */
object R17Probe {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("nd")
    val dir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(label: String)(df: => DataFrame): Unit = {
      // warm once, then two timed samples (min) — mirrors bench protocol
      df.write.format("noop").mode("overwrite").save()
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $label%-40s ${ts.min}%8.3f s")
    }

    val docs = graft.sources.Tables.documents(spark, dir)

    mode match {
      case "nd" =>
        import graft.operators.TextOps
        time("tokens-only") {
          docs.select(col("doc_id"),
            graft.operators.TextOps.tokens(col("text")).as("t"))
        }
        time("shingleSets(5)") { TextOps.probeShingleSets(docs, 5) }
        time("nd:pruned(window-df)") { TextOps.probeNdPruned(docs, 5) }
        time("nd:candidates") { TextOps.probeNdCandidates(docs, 5) }
        time("nd:full nearDupPairs(0.4)") { TextOps.nearDupPairs(docs, 5, 0.4) }
        time("mh:sigs") { TextOps.probeMhSigs(docs, 5) }
        time("mh:candidates") { TextOps.probeMhCandidates(docs, 5) }
        time("mh:full minhashPairs(0.7)") { TextOps.minhashPairs(docs, 5, 0.7) }
      case "ndv2" =>
        import graft.operators.TextOps
        def pairsFromGroups(grouped: DataFrame): DataFrame =
          grouped
            .select(col("ids"), posexplode(col("ids")).as(Seq("i", "doc_a")))
            .select(col("doc_a"),
              explode(slice(col("ids"), col("i") + lit(2),
                greatest(size(col("ids")) - col("i") - lit(1), lit(0))))
                .as("doc_b"))
        def ndCandidatesV2(n: Int): DataFrame = {
          val inverted = TextOps.probeShingleSets(docs, n)
            .select(col("doc_id"), explode(col("sh")).as("shk"))
          val groups = inverted.groupBy(col("shk"))
            .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
            .filter(size(col("ids")).between(2, 1000))
          pairsFromGroups(groups).distinct()
        }
        def mhCandidatesV2(n: Int, numHashes: Int = 64, bandRows: Int = 2): DataFrame = {
          val sigs = TextOps.probeMhSigs(docs, n, numHashes)
          val numBands = numHashes / bandRows
          val bandCols = (0 until numBands).map { b =>
            val parts = (0 until bandRows).map(r => col(s"h${b * bandRows + r}"))
            struct(lit(b).as("band"), xxhash64(parts: _*).as("bh"))
          }
          val banded = sigs
            .select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
            .select(col("doc_id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
          val groups = banded.groupBy(col("band"), col("bh"))
            .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
            .filter(size(col("ids")) >= 2)
          pairsFromGroups(groups).distinct()
        }
        def verifyV2(candidates: DataFrame, n: Int, threshold: Double): DataFrame = {
          val sh = TextOps.probeShingleSets(docs, n)
          val sides = candidates
            .select(col("doc_a"), col("doc_b"),
              explode(array(
                struct(col("doc_a").as("doc_id"), lit("a").as("side")),
                struct(col("doc_b").as("doc_id"), lit("b").as("side"))))
                .as("s"))
            .select(col("doc_a"), col("doc_b"),
              col("s.doc_id").as("doc_id"), col("s.side").as("side"))
          sides.join(sh, Seq("doc_id"))
            .groupBy(col("doc_a"), col("doc_b"))
            .agg(max(when(col("side") === "a", col("sh"))).as("sh_a"),
              max(when(col("side") === "b", col("sh"))).as("sh_b"))
            .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
            .withColumn("uni", size(col("sh_a")) + size(col("sh_b")) - col("inter"))
            .withColumn("jaccard",
              graft.functions.DeterministicAgg.roundFixed(
                col("inter").cast("double") / nullif(col("uni"), lit(0)), 4))
            .filter(col("jaccard") >= threshold)
            .select(col("doc_a"), col("doc_b"), col("jaccard"))
        }
        time("v2 nd:candidates") { ndCandidatesV2(5) }
        time("v2 nd:full (verify v1 shape)") { verifyV2(ndCandidatesV2(5), 5, 0.4) }
        time("v2 mh:candidates") { mhCandidatesV2(5) }
        time("v2 mh:full") { verifyV2(mhCandidatesV2(5), 5, 0.7) }
        // sanity: candidate sets and verified outputs must be identical
        val c1 = TextOps.probeNdCandidates(docs, 5)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val c2 = ndCandidatesV2(5)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        println(s"ND candidates equal: ${c1 == c2} (${c1.size} vs ${c2.size})")
        val m1 = TextOps.probeMhCandidates(docs, 5)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val m2 = mhCandidatesV2(5)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        println(s"MH candidates equal: ${m1 == m2} (${m1.size} vs ${m2.size})")
        val f1 = TextOps.nearDupPairs(docs, 5, 0.4)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        val f2 = verifyV2(ndCandidatesV2(5), 5, 0.4)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        println(s"ND verified equal: ${f1 == f2} (${f1.size} vs ${f2.size})")
      case "bloom" =>
        import graft.operators.TextOps
        import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
        import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
        import org.apache.spark.sql.graftbridge.ColumnBridge
        val (flaggedP, gramsP, benchGramsP) = TextOps.probeBenchGramSplit(docs, 5, 10)
        time("bloom:benchGrams-distinct") { benchGramsP }
        time("bloom:grams-all") { gramsP.select(col("doc_id"), col("g")) }
        def bfAggCol(expected: Long) = ColumnBridge.column(
          new BloomFilterAggregate(
            ColumnBridge.expression(xxhash64(col("g"))), Literal(expected),
            Literal(expected * 8L)).toAggregateExpression())
        def timeScalar(label: String)(f: => Any): Unit = {
          f
          val ts = (1 to 2).map { _ =>
            val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
          }
          println(f"PROBE $label%-40s ${ts.min}%8.3f s")
        }
        timeScalar("bloom:bf-agg(1<<20)") {
          benchGramsP.agg(bfAggCol(1L << 20).as("bf")).first()
        }
        timeScalar("bloom:bf-agg(1<<16)") {
          benchGramsP.agg(bfAggCol(1L << 16).as("bf")).first()
        }
        time("bloom:full") { TextOps.decontaminateBloom(docs) }
        time("bloom:plain-decontaminate") { TextOps.decontaminate(docs) }
      case "kn" =>
        import graft.operators.TextOps
        import org.apache.spark.sql.expressions.Window
        import graft.functions.DeterministicAgg.roundFixed
        // OLD shape (pre-r17): two corpus explodes, per-occurrence lp sum
        def knOld(documents0: DataFrame, discount: Double = 0.75): DataFrame = {
          val documents = documents0
          val bi = documents.select(col("doc_id"),
            explode(graft.operators.TextOps.positionalShingles(
              graft.operators.TextOps.tokens(col("text")), 2)).as("bg"))
          val c12 = bi.groupBy(col("bg")).agg(count(lit(1)).as("c12"))
            .withColumn("w1", substring_index(col("bg"), " ", 1))
            .withColumn("w2", substring_index(col("bg"), " ", -1))
          val wW1 = Window.partitionBy(col("w1"))
          val wW2 = Window.partitionBy(col("w2"))
          val wAll = Window.partitionBy()
          val lp = c12
            .withColumn("c1", sum(col("c12")).over(wW1))
            .withColumn("n1p_l", count(lit(1)).over(wW1))
            .withColumn("n1p_r", count(lit(1)).over(wW2))
            .withColumn("nbd", count(lit(1)).over(wAll))
            .select(col("bg"), roundFixed(log10(
              (col("c12").cast("double") - lit(discount)) / col("c1").cast("double") +
                ((lit(discount) * col("n1p_l").cast("double")) /
                  col("c1").cast("double")) *
                  (col("n1p_r").cast("double") / col("nbd").cast("double"))), 6)
              .as("lp"))
          val perDoc = bi.join(lp, "bg")
            .groupBy(col("doc_id"))
            .agg(count(lit(1)).as("n_bigrams"),
              graft.functions.DeterministicAgg.exactSum(col("lp")).as("slp"))
          documents.select(col("doc_id"))
            .join(perDoc, Seq("doc_id"), "left_outer")
            .select(col("doc_id"),
              coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
              when(col("n_bigrams").isNull, lit(null).cast("double"))
                .otherwise(roundFixed(col("slp") / col("n_bigrams"), 4))
                .as("kn_logprob"))
        }
        time("kn:OLD(no spread)") { knOld(docs) }
        time("kn:NEW") { TextOps.knBigramLogProb(docs) }
        val o = knOld(docs).collect().map(r => (r.getLong(0),
          r.getLong(1), if (r.isNullAt(2)) null else r.getDouble(2))).toSet
        val nn = TextOps.knBigramLogProb(docs).collect().map(r => (r.getLong(0),
          r.getLong(1), if (r.isNullAt(2)) null else r.getDouble(2))).toSet
        println(s"KN old==new: ${o == nn} (${o.size} vs ${nn.size})")
      case "b4" =>
        // batch-4 targets, timed through their declared query entries
        Seq("doc_dsir_weights", "emb_semantic_dedup", "doc_bm25_search",
          "doc_lrs", "doc_bpe_encode", "emb_hnsw_build", "emb_hnsw_walk",
          "part_dominant_suppliers")
          .foreach { n => time(n) { graft.SparkEntry.queries(n)(spark, dir) } }
        // dsir runtime exchange-reuse proof (the PlanRegressionSpec claim):
        // after execution the adaptive plan should carry a ReusedExchange/
        // ReusedQueryStage for the duplicated (doc,lang,bucket) pre-agg
        val d = graft.SparkEntry.queries("doc_dsir_weights")(spark, dir)
        d.collect()
        val reuseLines = d.queryExecution.executedPlan.toString
          .linesIterator.filter(_.contains("Reused")).toSeq
        println(s"DSIR reuse lines (${reuseLines.size}):")
        reuseLines.foreach(l => println("  " + l.trim.take(120)))
      case "b5" =>
        import graft.operators.TextOps
        import graft.functions.DeterministicAgg.{roundFixed, sumRounded}
        import org.apache.spark.sql.expressions.Window
        // dsir with the (doc,lang,bucket) pre-agg MATERIALIZED (runtime
        // exchange reuse measured absent in b4) vs the current dup-subtree
        def dsirCkpt(documents: DataFrame, targetLang: String = "en",
                     buckets: Int = 4096): DataFrame = {
          val toks = documents.select(col("doc_id"), col("lang"),
            explode(TextOps.tokens(col("text"))).as("term"))
            .withColumn("bucket",
              pmod(TextOps.portableHash64(col("term")), lit(buckets.toLong)))
          val perDocBucket = toks
            .groupBy(col("doc_id"), col("lang"), col("bucket"))
            .agg(count(lit(1)).as("cnt"))
            .localCheckpoint(true)
          val counts = perDocBucket.groupBy("bucket").agg(
            sum(when(col("lang") === lit(targetLang), col("cnt")).otherwise(0L))
              .as("c_tgt"),
            sum(col("cnt")).as("c_raw"))
          val wAll = Window.partitionBy()
          val llr = counts
            .withColumn("t_tgt", sum(col("c_tgt")).over(wAll))
            .withColumn("t_raw", sum(col("c_raw")).over(wAll))
            .select(col("bucket"),
              (roundFixed(log10((col("c_tgt") + lit(1L)).cast("double") /
                (col("t_tgt") + lit(buckets.toLong)).cast("double")), 6) -
                roundFixed(log10((col("c_raw") + lit(1L)).cast("double") /
                  (col("t_raw") + lit(buckets.toLong)).cast("double")), 6)).as("llr"))
          val llrDec = col("llr").cast(org.apache.spark.sql.types.DecimalType(28, 10))
          val cntDec = col("cnt").cast(org.apache.spark.sql.types.DecimalType(8, 0))
          val perDoc = perDocBucket.join(broadcast(llr), "bucket")
            .groupBy("doc_id")
            .agg(sum(col("cnt")).as("n_tokens"),
              sum(llrDec * cntDec).cast("double").as("sllr"))
          documents.select(col("doc_id"), col("lang"))
            .join(perDoc, Seq("doc_id"), "left_outer")
            .select(col("doc_id"), col("lang"),
              coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
              when(col("n_tokens").isNull, lit(null).cast("double"))
                .otherwise(roundFixed(col("sllr") / col("n_tokens"), 4))
                .as("dsir_weight"),
              when(col("n_tokens").isNull, lit(false))
                .otherwise(roundFixed(col("sllr") / col("n_tokens"), 4) > lit(0.0))
                .as("selected"))
        }
        time("dsir:current(dup-subtree)") { TextOps.dsirWeights(docs) }
        time("dsir:ckpt-preagg") { dsirCkpt(docs) }
        val oD = TextOps.dsirWeights(docs).collect().map(_.toString).sorted
        val nD = dsirCkpt(docs).collect().map(_.toString).sorted
        println(s"DSIR ckpt==current: ${oD.sameElements(nD)} (${oD.length})")
        // dominant suppliers: spread ahead of the one-scan window agg
        val li = graft.sources.Tables.lineitem(spark, dir)
        val supp = graft.sources.Tables.supplier(spark, dir)
        def dominantSpread(): DataFrame = {
          val perSupp = graft.operators.Spread.byKey(li, col("l_partkey"))
            .groupBy(col("l_partkey"), col("l_suppkey"))
            .agg(sumRounded(col("l_quantity"), 4).as("supp_qty"))
          val w = Window.partitionBy(col("l_partkey"))
          val withTotal = perSupp.withColumn("part_qty",
            roundFixed(sum(col("supp_qty")
              .cast(org.apache.spark.sql.types.DecimalType(38, 10))).over(w)
              .cast("double"), 4))
          withTotal
            .filter(lit(20.0) * col("supp_qty") > lit(3.0) * col("part_qty"))
            .join(supp, col("l_suppkey") === col("s_suppkey"))
            .select(col("l_partkey"), col("l_suppkey"), col("s_name"),
              col("supp_qty"), col("part_qty"))
        }
        time("dominant:current") {
          graft.operators.Relational.dominantSuppliers(supp, li) }
        time("dominant:spread") { dominantSpread() }
        val oS = graft.operators.Relational.dominantSuppliers(supp, li)
          .collect().map(_.toString).sorted
        val nS = dominantSpread().collect().map(_.toString).sorted
        println(s"DOMINANT spread==current: ${oS.sameElements(nS)} (${oS.length})")
      case "bd" =>
        import graft.operators.TextOps
        // OLD blockDedup shape: gram-keyed min AGG + equi-join-back
        def blockDedupOld(documents0: DataFrame, blockSize: Int = 16): DataFrame = {
          val documents = documents0 // spread applied below to match current
          val spread = {
            val par = documents.sparkSession.sparkContext.defaultParallelism
            if (par > 1 && documents.rdd.getNumPartitions < par)
              documents.repartition(par, col("doc_id")) else documents
          }
          val toked = spread.select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
          val blocks = toked.select(col("doc_id"),
            when(size(col("toks")) > 0,
              transform(
                sequence(lit(0), floor((size(col("toks")) - 1) / lit(blockSize)).cast("int")),
                i => concat_ws(" ",
                  slice(col("toks"), i * blockSize + lit(1), lit(blockSize)))))
              .otherwise(array().cast("array<string>")).as("blocks"))
          val b = blocks
            .select(col("doc_id"), posexplode(col("blocks")).as(Seq("idx", "block")))
            .withColumn("k", TextOps.portableHash64(col("block")))
          val first = b.groupBy(col("k"))
            .agg(min(struct(col("doc_id"), col("idx"))).as("f"))
          val kept = b.join(first, Seq("k"))
            .withColumn("keep",
              col("doc_id") === col("f.doc_id") && col("idx") === col("f.idx"))
          val agg = kept.groupBy(col("doc_id"))
            .agg(
              count(lit(1)).as("n_blocks"),
              sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
              concat_ws(" ", transform(
                array_sort(collect_list(when(col("keep"),
                  struct(col("idx"), col("block"))))),
                s => s.getField("block"))).as("dedup_text"))
          spread.select(col("doc_id")).join(agg, Seq("doc_id"), "left_outer")
            .select(col("doc_id"),
              coalesce(col("n_blocks"), lit(0L)).as("n_blocks"),
              coalesce(col("n_kept"), lit(0L)).as("n_kept"),
              coalesce(col("dedup_text"), lit("")).as("dedup_text"))
        }
        time("blockDedup:OLD(agg+join-back)") { blockDedupOld(docs) }
        time("blockDedup:NEW(window)") { TextOps.blockDedup(docs) }
        val oB = blockDedupOld(docs).collect().map(_.toString).sorted
        val nB = TextOps.blockDedup(docs).collect().map(_.toString).sorted
        println(s"BLOCKDEDUP old==new: ${oB.sameElements(nB)} (${oB.length})")
      case "cp" =>
        Seq("doc_curation", "doc_dedup_clusters", "doc_dedup_keep_best",
          "doc_pagerank")
          .foreach { n => time(n) { graft.SparkEntry.queries(n)(spark, dir) } }
      case "cur" =>
        import graft.operators.TextOps
        time("languageId") { TextOps.languageId(docs) }
        time("qualityScore") { TextOps.qualityScore(docs) }
        time("exactDedup") { TextOps.exactDedup(docs) }
        time("decontaminate") { TextOps.decontaminate(docs) }
        time("packDocuments") { TextOps.packDocuments(docs, 512) }
        time("curationPipelineFull") { TextOps.curationPipelineFull(docs) }
      case q =>
        time(q) { graft.SparkEntry.queries(q)(spark, dir) }
    }
    spark.stop()
  }
}
