package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Similarity

/** STREAMING HNSW INGEST (round-9 verdict #8, stretch): incremental
  * maintenance of the layered-graph serving index — new vectors attach
  * to the index through the SAME LSH-bucket candidate rule the batch
  * [[Similarity.hnswBuild]] uses, behind per-bucket streaming state, so
  * the serving graph stays current without full rebuilds.
  *
  * Decomposition (how a graph index is actually maintained online):
  *
  *  1. each arriving vector is BANDED exactly like the batch build
  *     ([[Similarity.hnswBandRows]] — the identical level hash, plane
  *     set, and per-layer bucket shift, so stream and batch see the
  *     same buckets by construction);
  *  2. a stateful per-(level, table, bucket) operator
  *     (flatMapGroupsWithState — bounded state: at most `bucketCap`
  *     member IDS per bucket, nothing vector-sized) admits the first
  *     `bucketCap` arrivals and emits the new member's candidate edges
  *     against the residents, in both directions;
  *  3. the serving snapshot re-ranks the accumulated candidate log with
  *     the batch build's OWN ranking tail
  *     ([[Similarity.rankHnswCandidates]] — shared code, not a replica),
  *     so the refreshed graph is bit-identical to what a from-scratch
  *     build over the same vectors would produce.
  *
  * INGEST CONTRACT (what makes stream ≡ batch provable): vec_ids arrive
  * in ascending order across micro-batches — the real ingest semantics,
  * where new corpus additions get new, larger ids. Under that order the
  * stream's first-`bucketCap`-arrivals cap admits exactly the batch
  * cap's lowest-`bucketCap` ids per bucket, so the accumulated
  * candidate SET equals the batch candidate set and the snapshot equals
  * the batch graph edge for edge (pinned in StreamingEtlSpec). A pair
  * co-resident in several tables is emitted once per table — the
  * snapshot's `distinct()` absorbs the duplicates, exactly like the
  * batch build's.
  *
  * Scale shape: state is O(buckets × bucketCap) LONGS — independent of
  * corpus size per key, RocksDB-spillable across keys; per-batch work
  * is O(new vectors × tables × levels) bucket visits plus emitted-pair
  * volume, the same candidate-bounded budget as the batch build. The
  * snapshot re-rank touches only (level, src) groups that gained
  * candidates — at 100 TB you would re-rank incrementally per dirty
  * src; here the snapshot ranks the full log because the SPEC's job is
  * equality with the batch graph. */
object StreamingHnsw {

  /** The stateful half: banded STREAMING vectors in, candidate edges
    * (level, src, dst) out — append mode, bounded per-bucket id state.
    * `bits` has NO default (round-10 advisor): it must be the batch
    * build's [[Similarity.autoBits]] of the final corpus size — the
    * bucket geometry is part of the artifact contract, like `numQueries`
    * on the sharded searcher — and a silent 4-bit footgun default made
    * stream-vs-batch divergence invisible. The ascending-id ingest
    * contract is ENFORCED, not assumed: each bucket's state carries the
    * largest id it has ever seen, and an arrival below it fails the
    * stream loudly instead of silently admitting a different member set
    * than the batch cap would. */
  def candidateEdges(vectors: DataFrame, bits: Int, numTables: Int = 16,
                     maxLevel: Int = 3, dim: Int = 64,
                     bucketCap: Int = 128): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val banded = Similarity
      .hnswBandRows(vectors, numTables, maxLevel, dim, bits)
      .as[(Long, Int, Int, Long)]
    banded
      .groupByKey { case (_, level, t, bl) => (level, t, bl) }
      .flatMapGroupsWithState[(Seq[Long], Long), (Int, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((level, _, _), rows, state: GroupState[(Seq[Long], Long)]) =>
          val (prev, prevMax) = state.getOption.getOrElse((Seq.empty[Long], Long.MinValue))
          val members = scala.collection.mutable.ArrayBuffer.empty[Long]
          members ++= prev
          val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
          // ascending within the batch (sorted here); the ingest contract
          // makes ids ascending ACROSS batches, so "bucket full" is final —
          // the batch build's lowest-bucketCap-ids cap, reached
          // incrementally. The contract is checked against the bucket's
          // high-water mark: a smaller id arriving after a larger one has
          // committed means a replayed/out-of-order ingest whose admitted
          // set could differ from the batch cap's — fail fast.
          val incoming = rows.map(_._1).toSeq.sorted
          incoming.headOption.foreach { lo =>
            if (lo < prevMax) throw new IllegalStateException(
              s"StreamingHnsw ingest contract violated: vec_id $lo arrived " +
                s"after $prevMax in the same bucket; ids must ascend across " +
                "micro-batches for stream==batch equality")
          }
          incoming.foreach { x =>
            if (members.size < bucketCap && !members.contains(x)) {
              members.foreach { y =>
                out += ((level, x, y)); out += ((level, y, x))
              }
              members += x
            }
          }
          state.update((members.toSeq,
            math.max(prevMax, incoming.lastOption.getOrElse(prevMax))))
          out.iterator
      }
      .toDF("level", "src", "dst")
  }

  /** The serving snapshot: distinct the accumulated candidate log and
    * rank it with the batch build's shared tail — the output schema and
    * every double are [[Similarity.hnswBuild]]'s. */
  def snapshotEdges(embeddings: DataFrame, candidates: DataFrame,
                    m: Int = 8): DataFrame =
    Similarity.rankHnswCandidates(embeddings,
      candidates.select(col("level"), col("src"), col("dst")).distinct(), m)
}
