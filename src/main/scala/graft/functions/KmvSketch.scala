package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** K-minimum-values cardinality sketch as a BOUNDED Aggregator — the
  * production shape behind [[graft.operators.Relational.eventTypeKmvUsers]]
  * (whose oracle-facing form ranks with a window and therefore holds
  * O(distinct) rows per group in the sort).
  *
  * The buffer is the set of the `k` smallest DISTINCT hash values seen,
  * O(k) at every stage — map-side partials included — and merge is
  * union + re-truncate, the standard KMV mergeability property (the same
  * bounded-buffer discipline as [[BoundedEarliest]]). `finish` returns the
  * estimate directly: exact `n` when fewer than `k` distinct values exist,
  * else (k−1) / (kth_min / 2^60) over the 60-bit portable-hash domain —
  * the identical arithmetic the oracled query and its DuckDB replica use,
  * asserted equal in KmvSketchSpec.
  *
  * Input is the already-hashed value (e.g.
  * `TextOps.portableHash64(user_id)`), so the Aggregator composes with any
  * key type and the hash contract stays in one place.
  */
/** The ONE bounded-k-minimum buffer discipline, shared by
  * [[BoundedEarliest]] (earliest timestamps, duplicates kept) and
  * [[KmvSketch]] (smallest distinct hashes): keep ≤k values on a plain
  * array, replacing the current maximum when a smaller value arrives —
  * O(k) per push, O(k) state at every aggregation stage. */
private[functions] object BoundedMinBuffer {
  def push(buf: Array[Long], v: Long, k: Int, distinct: Boolean): Array[Long] = {
    var i = 0
    if (distinct) {
      while (i < buf.length) { if (buf(i) == v) return buf; i += 1 }
    }
    if (buf.length < k) buf :+ v
    else {
      var maxIdx = 0
      i = 1
      while (i < buf.length) { if (buf(i) > buf(maxIdx)) maxIdx = i; i += 1 }
      if (v < buf(maxIdx)) { val out = buf.clone(); out(maxIdx) = v; out }
      else buf
    }
  }
}

final class KmvSketch(k: Int) extends Aggregator[Long, Array[Long], Double] {
  require(k > 1, "k must be > 1 (the estimator divides by k-1)")

  override def zero: Array[Long] = Array.empty[Long]

  override def reduce(buf: Array[Long], h: Long): Array[Long] =
    BoundedMinBuffer.push(buf, h, k, distinct = true)

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    b.foldLeft(a)((acc, v) => BoundedMinBuffer.push(acc, v, k, distinct = true))

  override def finish(buf: Array[Long]): Double =
    if (buf.length < k) buf.length.toDouble
    else (k - 1).toDouble / (buf.max.toDouble / math.pow(2.0, 60))

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Double] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Double]()
}
