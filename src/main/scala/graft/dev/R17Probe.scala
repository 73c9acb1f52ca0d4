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
