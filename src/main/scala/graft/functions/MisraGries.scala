package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries frequent-items sketch as a BOUNDED Aggregator: the
  * candidate-generation half of the exact two-pass heavy-hitter operator
  * ([[graft.operators.Relational.heavyUsers]]). The buffer is at most
  * `k − 1` (item, count) entries at EVERY aggregation stage — map-side
  * partials included — so a group of a billion rows costs the same state
  * as a group of a hundred.
  *
  * Guarantee (the property the two-pass design rests on): after any
  * sequence of reduces and merges over N total rows, every item whose true
  * count exceeds N / k is present in the buffer. Reduce is the classic
  * decrement-all step (Misra & Gries 1982); merge sums the two summaries
  * and subtracts the k-th largest combined count from every entry, keeping
  * the positives — the mergeable-summaries form (Agarwal et al., PODS
  * 2012), which preserves the additive N / k error bound under arbitrary
  * merge trees, i.e. under ANY Spark partitioning. The surviving CANDIDATE
  * set may vary with partitioning (the bound, not the set, is
  * deterministic) — which is exactly why the operator's second pass
  * re-counts candidates exactly and applies the real threshold, making the
  * final output partitioning-independent.
  *
  * `finish` returns the sorted candidate items; counts stay internal
  * (MG estimates under-count by up to N / k and must not leak as results).
  */
final class MisraGries(k: Int) extends Aggregator[Long, Map[Long, Long], Array[Long]] {
  require(k > 1, s"k must be > 1, got $k")

  override def zero: Map[Long, Long] = Map.empty

  override def reduce(buf: Map[Long, Long], x: Long): Map[Long, Long] =
    buf.get(x) match {
      case Some(c) => buf.updated(x, c + 1L)
      case None if buf.size < k - 1 => buf.updated(x, 1L)
      case None =>
        // full and x absent: decrement every counter, dropping zeros —
        // charges one occurrence of each of k distinct items (incl. x)
        buf.flatMap { case (key, c) =>
          if (c > 1L) Some(key -> (c - 1L)) else None
        }
    }

  override def merge(a: Map[Long, Long], b: Map[Long, Long]): Map[Long, Long] = {
    val combined = b.foldLeft(a) { case (acc, (key, c)) =>
      acc.updated(key, acc.getOrElse(key, 0L) + c)
    }
    if (combined.size <= k - 1) combined
    else {
      // subtract the k-th largest count from all entries; at most k − 1
      // entries can strictly exceed it, so the result is bounded again
      val cut = combined.values.toArray.sorted.apply(combined.size - k)
      combined.flatMap { case (key, c) =>
        if (c > cut) Some(key -> (c - cut)) else None
      }
    }
  }

  override def finish(buf: Map[Long, Long]): Array[Long] =
    buf.keys.toArray.sorted

  override def bufferEncoder: Encoder[Map[Long, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[Long, Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
