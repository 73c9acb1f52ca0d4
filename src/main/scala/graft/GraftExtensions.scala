package graft

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.functions.DeterministicAgg
import graft.operators.{Similarity, TextOps}

/** SQL surface for the engine's scalar operators: registers them as
  * catalog functions so `spark.sql("SELECT graft_simhash(text) ...")` works
  * — the Catalyst extension point (`SparkSessionExtensions.injectFunction`)
  * rather than `spark.udf.register`, so the functions expand into the same
  * codegen'd expression trees the DataFrame API builds (no UDF boundary,
  * Catalyst optimizes through them).
  *
  * Activate per session with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * imperatively via [[GraftFunctions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach(ext.injectFunction)
    // the custom as-of operator's planner strategy + its pushdown rule
    // (build-time registration; AsOf.backward/forward also self-register
    // at runtime through spark.experimental for extension-less sessions)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.PushFilterThroughAsOfJoin)
  }
}

object GraftFunctions {
  private def colFn(name: String, arity: Int, usage: String)(
      build: Seq[Column] => Column)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = {
    val builder = (children: Seq[Expression]) => {
      require(children.length == arity,
        s"$name expects $arity argument(s), got ${children.length}")
      ColumnBridge.expression(build(children.map(ColumnBridge.column)))
    }
    (new FunctionIdentifier(name), new ExpressionInfo(getClass.getName, name, usage),
      builder)
  }

  /** All engine SQL functions. Names are prefixed graft_ to stay clear of
    * the built-in namespace. */
  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    colFn("graft_simhash", 1, "64-bit SimHash of whitespace-tokenized text") {
      case Seq(text) => TextOps.simhash(text)
    },
    colFn("graft_tokens", 1, "whitespace tokens, empties dropped") {
      case Seq(text) => TextOps.tokens(text)
    },
    colFn("graft_cosine", 2, "cosine similarity of two double arrays") {
      case Seq(a, b) => Similarity.cosine(a, b)
    },
    colFn("graft_dot", 2, "sequential-fold dot product of two double arrays") {
      case Seq(a, b) => Similarity.dot(a, b)
    },
    colFn("graft_round_fixed4", 1,
      "engine-portable floor(x*1e4+0.5)/1e4 rounding") {
      case Seq(x) => DeterministicAgg.roundFixed(x, 4)
    },
    colFn("graft_portable_hash64", 1,
      "engine-portable 60-bit hash (sha256 prefix as bigint)") {
      case Seq(x) => TextOps.portableHash64(x)
    },
    colFn("graft_simhash_portable", 1,
      "oracle-reproducible 60-bit SimHash of whitespace-tokenized text") {
      case Seq(text) => TextOps.simhashPortable(text)
    },
    colFn("graft_bpe_tokens", 1,
      "BPE-style pre-tokens: letter runs, digit runs, single symbols") {
      case Seq(text) =>
        org.apache.spark.sql.functions.regexp_extract_all(
          text, org.apache.spark.sql.functions.lit(TextOps.bpePattern),
          org.apache.spark.sql.functions.lit(0))
    },
    colFn("graft_redact_pii", 1,
      "typed-placeholder PII redaction (email/IP/card/phone)") {
      case Seq(text) => TextOps.redactChain(text)
    },
    colFn("graft_hilbert20", 2,
      "20-bit Hilbert-curve index of two bigint coordinates") {
      case Seq(a, b) => graft.functions.Hilbert.hilbertKeyNative(a, b, 20)
    }
  )

  /** Imperative registration for an existing session (tests, REPL). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
