package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Order-independent aggregates over double columns.
  *
  * Floating-point sums are not associative: a parallel partial+final
  * aggregation and the oracle's single-threaded scan can land on opposite
  * sides of a decimal rounding boundary (observed: round(avg, 4) flipping
  * 54.3277 vs 54.3278 when the exact mean is 54.32775). Summing in a wide
  * decimal is exact and associative, so any partition order produces the
  * identical result, and the final double division/round is deterministic.
  * The 1e-10 decimal quantization of each input double is itself
  * deterministic (same cast on both engines).
  *
  * At scale this costs one decimal column in the aggregation buffer instead
  * of a double — same shuffle volume class, still a partial+final hash agg.
  */
object DeterministicAgg {
  private val Wide = DecimalType(38, 10)

  /** Engine-portable decimal rounding: floor(x·10^s + 0.5)/10^s computed in
    * plain double arithmetic. Spark's `round` goes through the double's
    * SHORTEST DECIMAL STRING (BigDecimal.valueOf) while DuckDB rounds the
    * binary value — at a half boundary (x = …0.53374999…, printed "0.53375")
    * they disagree. This formula is the same three IEEE ops on both engines,
    * so identical inputs give bit-identical outputs everywhere.
    */
  def roundFixed(c: Column, scale: Int): Column = {
    val p = lit(math.pow(10, scale))
    floor(c * p + lit(0.5)) / p
  }

  /** Exact (order-independent) sum of a double column, back as double. */
  def exactSum(c: Column): Column = sum(c.cast(Wide)).cast("double")

  /** Deterministic round(sum(c), scale). */
  def sumRounded(c: Column, scale: Int): Column = roundFixed(exactSum(c), scale)

  /** Deterministic round(avg(c), scale) — divides by count of non-nulls,
    * matching `avg` semantics. */
  def avgRounded(c: Column, scale: Int): Column =
    roundFixed(exactSum(c) / count(c), scale)

  // ---- driver/executor-LOCAL twins of the column contract, for operators
  // that iterate on collected metadata-scale state (eventMarkov's π,
  // textrank's per-doc walk, the GD/jacobi family). ONE definition — a
  // drift between copies would silently break one operator's oracle while
  // the others stay green.

  /** Local twin of [[roundFixed]]: the identical three IEEE ops. */
  def roundFixedLocal(x: Double, scale: Int): Double = {
    val p = math.pow(10, scale)
    math.floor(x * p + 0.5) / p
  }

  /** Local twin of the `cast(x as decimal(38,10))` both engines share:
    * BigDecimal of the double's SHORTEST decimal repr (what Spark's
    * Decimal(double) does), half-up at scale 10 — proven to match DuckDB
    * by every exactSum oracle. Sum these, then `.doubleValue()`. */
  def wideDecimalLocal(x: Double): java.math.BigDecimal =
    new java.math.BigDecimal(java.lang.Double.toString(x))
      .setScale(10, java.math.RoundingMode.HALF_UP)

  /** UTF-8 byte (= code point) order — Spark UTF8String's and DuckDB's
    * binary collation. Java's String.compareTo orders by UTF-16 code
    * UNITS, which diverges for supplementary-plane characters, so local
    * tie-breaks must never use it. */
  def utf8Less(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val m = math.min(x.length, y.length)
    while (i < m) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }
}
