package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** THE kernel-entry spread (round-16 optimization; consolidated to one
  * definition by the round-16 advisor — the three per-file copies had
  * already drifted on the `par > 1` guard).
  *
  * Hash-repartition a sub-parallel scan immediately ahead of a HEAVY
  * per-row kernel: the driver's single-row-group parquet tables arrive as
  * ONE input split, so everything narrow downstream of a bare scan runs
  * on one core. Gated on `splits < defaultParallelism`, so a scan that
  * already spans the cluster (any real 100 TB table) is untouched — the
  * plan at scale is identical. The key must be high-cardinality and
  * already in the operator's read set (doc_id, l_extendedprice), so
  * column pruning is unchanged and the spread is retry-deterministic
  * (hash of data, not round-robin).
  *
  * Call sites opt in per operator, never at the reader: the reader-level
  * version was A/B'd and REJECTED in round 16 (multi-reference queries
  * re-execute the exchange per reference, iterative operators per round —
  * measured ~100 s worse bench-wide; see Tables.read). */
private[graft] object Spread {
  def byKey(df: DataFrame, key: Column): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (par > 1 && df.rdd.getNumPartitions < par) df.repartition(par, key)
    else df
  }
}
