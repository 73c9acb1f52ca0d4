package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection}

/** Serializable build recipe for [[AsOfKeyIndex]] — shipped to tasks as a
  * codegen reference object. `rightKeys`/`rightTime` are already BOUND to
  * the broadcast side's output. `toleranceOrNeg` < 0 means no tolerance
  * bound (tolerances are non-negative by [[AsOfJoinPlan]] contract). */
final case class AsOfIndexSpec(
    rightKeys: Seq[Expression], rightTime: Expression,
    forward: Boolean, toleranceOrNeg: Long) extends Serializable {
  /** Java-callable entry for the generated mutable-state init (an
    * instance method dodges the `Object$.MODULE$` dance in Janino). */
  def buildIndex(rows: Array[InternalRow]): AsOfKeyIndex =
    AsOfKeyIndex.build(rows, this)
}

/** Per-task as-of lookup index over a broadcast right side: key →
  * time-sorted rows, answered by binary search. Time is normalized to its
  * integral internal form (micros for timestamps, days for dates, raw for
  * integral columns) — the only types the codegen path admits. Built once
  * per task (the generated class's mutable-state init), the same cost
  * class as a broadcast hash join's per-task hashing. */
final class AsOfKeyIndex(
    index: java.util.HashMap[InternalRow, (Array[Long], Array[InternalRow])],
    forward: Boolean, tol: Long) {

  /** Latest right row at-or-before `time` (backward) / earliest at-or-
    * after (forward) for `key`, honoring the tolerance; null when
    * unmatched. Callers guarantee `key` has no null fields. */
  def lookup(key: InternalRow, time: Long): InternalRow = {
    val entry = index.get(key)
    if (entry == null) return null
    val times = entry._1; val rows = entry._2
    // first index with times(i) > time
    var lo = 0; var hi = times.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (times(mid) <= time) lo = mid + 1 else hi = mid
    }
    if (forward) {
      var i = lo // step back over the == run: ties are inclusive
      while (i > 0 && times(i - 1) == time) i -= 1
      if (i < times.length && (tol < 0 || times(i) - time <= tol)) rows(i)
      else null
    } else if (lo > 0 && (tol < 0 || time - times(lo - 1) <= tol)) rows(lo - 1)
    else null
  }
}

object AsOfKeyIndex {
  private[plans] def timeToLong(v: Any): Long = v.asInstanceOf[Number].longValue

  /** Build the index from the broadcast rows: null-keyed and null-timed
    * rows stay out (SQL equi-join semantics — see AsOfJoin), per-key rows
    * sort by time (stable, so equal times keep arrival order and the
    * binary search's last-of-run choice matches the merge exec's
    * later-row-wins held state). */
  def build(rows: Array[InternalRow], spec: AsOfIndexSpec): AsOfKeyIndex = {
    val rKeyProj = UnsafeProjection.create(spec.rightKeys)
    val grouped = new java.util.HashMap[
      InternalRow, scala.collection.mutable.ArrayBuffer[(Long, InternalRow)]]()
    rows.foreach { r =>
      val t = spec.rightTime.eval(r)
      if (t != null && !rKeyProj(r).anyNull) {
        val k = rKeyProj(r).copy()
        var buf = grouped.get(k)
        if (buf == null) {
          buf = new scala.collection.mutable.ArrayBuffer[(Long, InternalRow)]()
          grouped.put(k, buf)
        }
        buf += ((timeToLong(t), r))
      }
    }
    val index = new java.util.HashMap[InternalRow, (Array[Long], Array[InternalRow])]()
    grouped.forEach { (k, buf) =>
      val sorted = buf.sortBy(_._1)
      index.put(k, (sorted.map(_._1).toArray, sorted.map(_._2).toArray))
    }
    new AsOfKeyIndex(index, spec.forward, spec.toleranceOrNeg)
  }
}
