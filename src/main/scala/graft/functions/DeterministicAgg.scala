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
}
