package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SQL surface: engine operators callable from spark.sql, expanding to
  * the same expression trees as the DataFrame API (no UDF boundary). */
class GraftExtensionsSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    GraftFunctions.register(s)
    s
  }

  test("graft_simhash and graft_tokens are SQL-callable and agree with the API") {
    import spark.implicits._
    Seq(("a b c", 1L)).toDF("text", "id").createOrReplaceTempView("t_ext")
    val viaSql = spark.sql(
      "SELECT graft_simhash(text) AS h, size(graft_tokens(text)) AS n FROM t_ext")
      .collect().head
    val viaApi = Seq(("a b c", 1L)).toDF("text", "id")
      .select(graft.operators.TextOps.simhash(org.apache.spark.sql.functions.col("text")))
      .collect().head.getLong(0)
    assert(viaSql.getAs[Long]("h") == viaApi)
    assert(viaSql.getAs[Int]("n") == 3)
  }

  test("graft_cosine in SQL matches the exact value") {
    val c = spark.sql(
      "SELECT graft_round_fixed4(graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d))) AS c")
      .collect().head.getDouble(0)
    assert(c == 1.0)
    val ortho = spark.sql(
      "SELECT graft_cosine(array(1.0d, 0.0d), array(0.0d, 1.0d)) AS c")
      .collect().head.getDouble(0)
    assert(ortho == 0.0)
  }

  test("portable hash/simhash/bpe functions are SQL-callable and agree with the API") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    Seq(("hello world42!", 1L)).toDF("text", "id").createOrReplaceTempView("t_ext2")
    val viaSql = spark.sql(
      """SELECT graft_portable_hash64(text) AS h,
         graft_simhash_portable(text) AS sh,
         size(graft_bpe_tokens(text)) AS nb FROM t_ext2""").collect().head
    val api = Seq(("hello world42!", 1L)).toDF("text", "id")
    assert(viaSql.getAs[Long]("h") ==
      api.select(graft.operators.TextOps.portableHash64(col("text")))
        .collect().head.getLong(0))
    assert(viaSql.getAs[Long]("sh") ==
      api.select(graft.operators.TextOps.simhashPortable(col("text")))
        .collect().head.getLong(0))
    assert(viaSql.getAs[Int]("nb") == 4) // hello, world, 42, !
  }

  test("graft_redact_pii is SQL-callable and redacts typed placeholders") {
    import spark.implicits._
    Seq(("mail bob@x.io from 10.0.0.1", 1L)).toDF("text", "id")
      .createOrReplaceTempView("t_pii")
    val out = spark.sql("SELECT graft_redact_pii(text) AS r FROM t_pii")
      .collect().head.getString(0)
    assert(out == "mail <EMAIL> from <IP>", out)
  }

  test("graft_dot/graft_cosine accept array<float> via implicit coercion") {
    import spark.implicits._
    // the embeddings table's actual storage type is array<float> — the SQL
    // surface must coerce it like the old aggregate(zip_with(...)) fold did
    Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f)))
      .toDF("a", "b").createOrReplaceTempView("t_float_vecs")
    val d = spark.sql("SELECT graft_dot(a, b) AS d FROM t_float_vecs")
      .collect().head.getDouble(0)
    assert(d == 11.0)
    val c = spark.sql(
      "SELECT graft_round_fixed4(graft_cosine(a, a)) AS c FROM t_float_vecs")
      .collect().head.getDouble(0)
    assert(c == 1.0)
  }

  test("graft_hilbert20 is SQL-callable and agrees with the kernel") {
    import spark.implicits._
    Seq((5L, 9L), (12345L, 678L)).toDF("a", "b").createOrReplaceTempView("t_hil")
    val got = spark.sql("SELECT a, b, graft_hilbert20(a, b) AS h FROM t_hil")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (a, b, h) =>
      assert(h == graft.functions.HilbertUtil.xy2d(20, a, b), s"($a,$b)")
    }
  }

  test("wrong arity yields a clear error naming the function") {
    val e = intercept[Exception](spark.sql("SELECT graft_cosine(array(1.0d))").collect())
    assert(e.getMessage.contains("graft_cosine"))
  }
}
