package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorExpressions.dotNative

/** The native codegen'd DotProduct must be bit-identical to the
  * higher-order-function fold it replaced — oracles were built on the fold. */
class VectorExpressionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  test("native dot equals the HOF fold bit-for-bit on real embeddings") {
    val e = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val both = e.select(
      dotNative(col("v"), col("v")).as("native"),
      hofDot(col("v"), col("v")).as("hof"))
    assert(both.filter(!(col("native") <=> col("hof"))).count() == 0)
    assert(both.count() > 0)
  }

  test("null array, null element, and length mismatch match zip_with semantics") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0, 4.0)), // 11
      (2L, Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](3.0, 4.0)), // null elem
      (3L, null, Seq[java.lang.Double](3.0, 4.0)), // null array
      (4L, Seq[java.lang.Double](1.0, 2.0, 5.0), Seq[java.lang.Double](3.0, 4.0)) // mismatch → null
    ).toDF("id", "a", "b")
    val out = df.select(col("id"), dotNative(col("a"), col("b")).as("d"),
      hofDot(col("a"), col("b")).as("h")).collect()
      .map(r => r.getAs[Long]("id") ->
        (Option(r.getAs[java.lang.Double]("d")), Option(r.getAs[java.lang.Double]("h")))).toMap
    assert(out(1L)._1.contains(11.0) && out(1L) == out(1L).swap.swap)
    out.foreach { case (id, (native, hof)) => assert(native == hof, s"row $id") }
    assert(out(2L)._1.isEmpty)
    assert(out(3L)._1.isEmpty)
    assert(out(4L)._1.isEmpty) // zip_with null-pads the shorter → null sum
  }

  test("native simhash equals the HOF formulation on real documents") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val both = docs.select(
      graft.operators.TextOps.simhash(col("text")).as("native"),
      graft.operators.TextOps.simhashHof(col("text")).as("hof"))
    assert(both.filter(!(col("native") <=> col("hof"))).count() == 0)
    assert(both.count() > 0)
  }

  test("native portable simhash equals the HOF formulation on real documents") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val both = docs.select(
      graft.operators.TextOps.simhashPortable(col("text")).as("native"),
      graft.operators.TextOps.simhashPortableHof(col("text")).as("hof"))
    assert(both.filter(!(col("native") <=> col("hof"))).count() == 0)
    assert(both.count() > 0)
  }

  test("fused gram hashes equal the declarative shingle+hash chain on real documents") {
    import graft.functions.VectorExpressions.{gramShaHashes, gramXxHashes}
    import graft.operators.TextOps
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
    val both = docs.select(
      gramShaHashes(col("toks"), 3).as("sha_native"),
      transform(TextOps.positionalShingles(col("toks"), 3),
        g => TextOps.portableHash64(g)).as("sha_hof"),
      gramXxHashes(col("toks"), 5).as("xx_native"),
      transform(TextOps.positionalShingles(col("toks"), 5),
        g => xxhash64(g)).as("xx_hof"))
    assert(both.filter(
      !(col("sha_native") <=> col("sha_hof")) ||
        !(col("xx_native") <=> col("xx_hof"))).count() == 0)
    assert(both.count() > 0)
  }

  test("fused LSH buckets equal the chained dot+when fold on real embeddings") {
    import graft.functions.VectorExpressions.lshBuckets
    import graft.operators.Similarity
    val numTables = 4
    val bits = 5
    val all = Similarity.planes(numTables * bits, 64)
    val e = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(transform(col("embedding"), x => x.cast("double")).as("v"))
    val hofCols = (0 until numTables).map(t =>
      Similarity.bucketOfHof(col("v"), all.slice(t * bits, (t + 1) * bits)))
    val both = e.select(
      lshBuckets(col("v"), all, numTables, bits).as("native"),
      array(hofCols: _*).as("hof"))
    assert(both.filter(!(col("native") <=> col("hof"))).count() == 0)
    assert(both.count() > 0)
  }

  test("LSH buckets: length mismatch and null element give all-zero buckets (HOF parity)") {
    import graft.functions.VectorExpressions.lshBuckets
    import graft.operators.Similarity
    import spark.implicits._
    val all = Similarity.planes(4, 2)
    val df = Seq(
      (1L, Seq[java.lang.Double](1.0, 2.0)), // clean
      (2L, Seq[java.lang.Double](1.0, null)), // null element → null dots → bits 0
      (3L, Seq[java.lang.Double](1.0, 2.0, 3.0)) // dim mismatch → null dots → bits 0
    ).toDF("id", "v")
    val hofCols = (0 until 2).map(t =>
      Similarity.bucketOfHof(col("v"), all.slice(t * 2, (t + 1) * 2)))
    val out = df.select(col("id"),
      lshBuckets(col("v"), all, 2, 2).as("native"),
      array(hofCols: _*).as("hof")).collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[scala.collection.Seq[Long]]("native").toList,
          r.getAs[scala.collection.Seq[Long]]("hof").toList)).toMap
    out.foreach { case (id, (native, hof)) => assert(native == hof, s"row $id") }
    assert(out(2L)._1 == List(0L, 0L))
    assert(out(3L)._1 == List(0L, 0L))
  }

  test("nearest codewords kernel equals the unrolled array_sort form bit-for-bit") {
    import graft.functions.VectorExpressions.nearestCodewordIds
    val e = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    // codebook: the first 7 vectors, id-ascending, with the L2-norm aux —
    // exactly the anchors() shape
    val cb = e.filter(col("vec_id") < 7).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq))
      .sortBy(_._1)
      .map { case (id, v) => (id, v, math.sqrt(v.map(x => x * x).sum)) }
      .toSeq
    // the unrolled form the kernel replaced (cosine metric, keep = 3)
    def unrolledCos(v: org.apache.spark.sql.Column, keep: Int) = {
      val nrm = sqrt(dotNative(v, v))
      val entries = cb.map { case (id, va, nrmA) =>
        struct(
          (-(dotNative(v, array(va.map(lit): _*)) / (nrm * lit(nrmA)))).as("negc"),
          lit(id).as("aid"))
      }
      transform(slice(array_sort(array(entries: _*)), 1, keep),
        s => s.getField("aid"))
    }
    // the unrolled L2 form (keep = 1)
    def unrolledL2(v: org.apache.spark.sql.Column) = {
      def dotSeq(a: Seq[Double], b: Seq[Double]): Double = {
        var s = 0.0; var i = 0
        while (i < a.length) { s += a(i) * b(i); i += 1 }; s
      }
      val entries = cb.map { case (id, cw, _) =>
        struct(
          (lit(dotSeq(cw, cw)) - lit(2.0) * dotNative(v, array(cw.map(lit): _*))).as("d2"),
          lit(id).as("aid"))
      }
      slice(array_sort(array(entries: _*)), 1, 1).getItem(0).getField("aid")
    }
    val cbL2 = cb.map { case (id, cw, _) =>
      (id, cw, { var s = 0.0; var i = 0
        while (i < cw.length) { s += cw(i) * cw(i); i += 1 }; s })
    }
    val both = e.select(
      nearestCodewordIds(col("v"), cb, l2 = false, keep = 3).as("n_cos"),
      unrolledCos(col("v"), 3).as("u_cos"),
      graft.functions.VectorExpressions.nearestCodewordIds(
        col("v"), cbL2, l2 = true, keep = 1).getItem(0).as("n_l2"),
      unrolledL2(col("v")).as("u_l2"))
    assert(both.filter(!(col("n_cos") <=> col("u_cos")) ||
      !(col("n_l2") <=> col("u_l2"))).count() == 0)
    assert(both.count() > 0)
  }

  test("nearest codewords: invalid vectors tie every key -> ascending ids (array_sort parity)") {
    import graft.functions.VectorExpressions.nearestCodewordIds
    import spark.implicits._
    val cb = Seq(
      (3L, Seq(1.0, 0.0), 1.0), (5L, Seq(0.0, 1.0), 1.0),
      (9L, Seq(1.0, 1.0), math.sqrt(2.0)))
    val df = Seq(
      (1L, Seq[java.lang.Double](1.0, 0.5)),  // clean
      (2L, Seq[java.lang.Double](1.0, null)), // null element
      (3L, Seq[java.lang.Double](1.0)),       // dim mismatch
      (4L, Seq[java.lang.Double](0.0, 0.0))   // zero norm -> NaN cosine keys
    ).toDF("id", "v")
    val out = df.select(col("id"),
      nearestCodewordIds(col("v"), cb, l2 = false, keep = 2).as("ids")).collect()
      .map(r => r.getAs[Long]("id") ->
        r.getAs[scala.collection.Seq[Long]]("ids").toList).toMap
    assert(out(1L) == List(9L, 3L))       // cos: (1,1) 0.949 > (1,0) 0.894
    assert(out(2L) == List(3L, 5L))       // null key -> id-ascending
    assert(out(3L) == List(3L, 5L))       // mismatch -> id-ascending
    assert(out(4L) == List(3L, 5L))       // all-NaN ties -> id-ascending
  }

  test("native CDC bounds equal the HOF fold on real docs and edge texts") {
    import spark.implicits._
    import graft.operators.TextOps
    val real = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    def collectBounds(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Int]] =
      df.select(col("doc_id"), col("bounds")).collect()
        .map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
    assert(collectBounds(TextOps.withCdcBounds(real)) ==
      collectBounds(TextOps.withCdcBoundsHof(real)))
    // adversarial shapes: below/at the window, forced-cut boundary at
    // exactly cdcMax, repetitive text (many hash fires), BMP unicode
    val edge = Seq(
      (1L, "a"), (2L, "a" * 15), (3L, "a" * 16), (4L, "a" * 17),
      (5L, "x" * 256), (6L, "x" * 257), (7L, "ab" * 300),
      (8L, "the quick brown fox " * 40), (9L, "héllo wörld 愛" * 30))
      .toDF("doc_id", "text")
    assert(collectBounds(TextOps.withCdcBounds(edge)) ==
      collectBounds(TextOps.withCdcBoundsHof(edge)))
    // and the native scan is inside whole-stage codegen
    val plan = TextOps.withCdcBounds(real).queryExecution.executedPlan.toString
    val line = plan.linesIterator.find(_.toLowerCase.contains("cdcbounds")).get
    assert(line.trim.startsWith("*("), plan)
  }

  test("the expression runs inside WholeStageCodegen (not interpreted fallback)") {
    val e = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(transform(col("embedding"), x => x.cast("double")).as("v"))
      .select(dotNative(col("v"), col("v")).as("d"))
    // codegen stages print as "*(n) Operator" in this format: the Project
    // evaluating dotproduct must be starred (inside whole-stage codegen)
    val plan = e.queryExecution.executedPlan.toString
    val dotLine = plan.linesIterator.find(_.contains("dotproduct")).get
    assert(dotLine.trim.startsWith("*("), plan)
  }
}
