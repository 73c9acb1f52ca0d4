package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.DeterministicAgg.{exactSum, roundFixed}

/** STREAMING covariance maintenance — the moments-are-mergeable proof
  * for the embedding-statistics family: the d²-cell covariance grid
  * (the oracled batch `Similarity.covarianceMatrix`) maintained
  * incrementally over a vector stream, because every cell's state is
  * three decimal-exact sums and a count — classic mergeable moments,
  * the same algebra the HLL register rollup proved for sketches.
  *
  * Shape differences from the batch operator, both deliberate:
  *
  *  - the per-dim sums are folded INTO the per-cell aggregate (each
  *    (i, j) cell accumulates Σxᵢ and Σxⱼ alongside Σxᵢxⱼ) instead of
  *    the batch plan's separate d-row broadcast join — a streaming
  *    aggregate cannot join two streaming aggregates, and the d²-cell
  *    duplication of the d sums is d extra decimals per cell: nothing;
  *  - update output mode re-emits refreshed cells per micro-batch; the
  *    LATEST emission per cell is the maintained covariance (the
  *    histogram-sketch maintenance discipline).
  *
  * The arithmetic is the batch operator's exactly — decimal-exact sums
  * over the same multisets, the identical (sij − si·sj/n)/n tree, the
  * same 1e-6 rounding — so the streamed snapshot equals the batch grid
  * CELL FOR CELL (spec-pinned), not approximately. State: d² cells ×
  * (count + 3 decimals) — fixed at any corpus size, RocksDB-spillable. */
object StreamingCovariance {

  def covarianceStream(vectors: DataFrame): DataFrame = {
    val v = transform(col("embedding"), x => x.cast("double"))
    val xi = vectors.select(v.as("v"))
      .select(posexplode(col("v")).as(Seq("i", "xi")), col("v"))
    val pairs = xi.select(col("i"), col("xi"),
      posexplode(col("v")).as(Seq("j", "xj")))
    pairs.groupBy(col("i"), col("j")).agg(
        count(lit(1)).as("n_vectors"),
        exactSum(col("xi") * col("xj")).as("sij"),
        exactSum(col("xi")).as("si"),
        exactSum(col("xj")).as("sj"))
      .select(col("i"), col("j"), col("n_vectors"),
        roundFixed((col("sij") - col("si") * col("sj") / col("n_vectors"))
          / col("n_vectors"), 6).as("cov"))
  }
}
