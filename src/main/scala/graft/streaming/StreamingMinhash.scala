package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.TextOps

/** STREAMING MinHash/LSH DEDUP MAINTENANCE (round-11 verdict #2): the
  * streaming case a training-data pipeline actually runs daily —
  * dedup-against-a-growing-corpus. New documents are signature-banded
  * exactly like the batch [[TextOps.minhashPairs]] (shared per-row
  * formulation, [[TextOps.minhashBandRows]] — identical shingle hash set,
  * identical 64 seeded minima, identical band hashes, by construction),
  * and a stateful per-(band, bucket) operator maintains each bucket's
  * member set, emitting a candidate pair the moment a new arrival lands
  * in a bucket with residents — so the candidate log accumulated across
  * micro-batches is EXACTLY the batch band-collision candidate set, and
  * the snapshot's batch verify tail yields the batch answer.
  *
  * Equality argument (what makes stream ≡ batch provable): the batch
  * candidate set is "all unordered doc pairs sharing ≥1 band bucket,
  * distinct". Per bucket the stream emits each member pair exactly once —
  * when the LATER member arrives (ascending-id ingest contract) — against
  * every EARLIER member, whether that member arrived in a prior batch
  * (state) or earlier in the same batch (in-batch ascending fold). Union
  * over buckets + the snapshot's distinct (a pair may collide in several
  * bands) = the batch set. No cap, no df guard: the batch operator has
  * none either — candidate volume is governed by the band/row s-curve,
  * not shingle document frequency, which is precisely why this family is
  * the streaming-safe one.
  *
  * INGEST CONTRACT (enforced, not assumed — the StreamingHnsw rule): doc
  * ids ascend across micro-batches, the real growing-corpus semantics
  * where new documents get new, larger ids. Each bucket's state carries
  * its high-water mark and fails the stream loudly on a smaller arrival —
  * a replayed or out-of-order ingest would otherwise silently emit
  * duplicate or misoriented pairs. Under the contract every emitted pair
  * is (smaller, larger) = the batch's (doc_a < doc_b) orientation with no
  * post-hoc least/greatest repair.
  *
  * Scale shape: state is O(member ids) LONGS per bucket key — nothing
  * document-sized; keys shard across state partitions and RocksDB-spill.
  * Per-batch work is O(new docs × bands) bucket visits plus emitted-pair
  * volume — the same candidate-bounded budget as the batch join. At
  * 100 TB the one structural watch-item is a boilerplate bucket growing
  * its member list; the batch twin has the same quadratic pair volume
  * there (it is the s-curve's false-positive cost, paid by either
  * engine), so the stream adds no new hazard class. */
object StreamingMinhash {

  /** The stateful half: streaming documents in, candidate pairs
    * (doc_a < doc_b) out — append mode, per-(band, bucket) member-set
    * state with the ascending-id contract enforced per bucket. */
  def candidatePairs(documents: DataFrame, n: Int = 5, numHashes: Int = 64,
                     bandRows: Int = 2): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val banded = TextOps.minhashBandRows(documents, n, numHashes, bandRows)
      .select(col("doc_id"), col("band"), col("bh"))
      .as[(Long, Int, Long)]
    banded
      .groupByKey { case (_, band, bh) => (band, bh) }
      .flatMapGroupsWithState[(Seq[Long], Long), (Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, rows, state: GroupState[(Seq[Long], Long)]) =>
          val (prev, prevMax) =
            state.getOption.getOrElse((Seq.empty[Long], Long.MinValue))
          val members = scala.collection.mutable.ArrayBuffer.empty[Long]
          members ++= prev
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
          // ascending within the batch (sorted here — iterator order is
          // arbitrary); the ingest contract makes ids ascend ACROSS
          // batches, checked against the bucket's high-water mark
          val incoming = rows.map(_._1).toSeq.sorted
          incoming.headOption.foreach { lo =>
            if (lo < prevMax) throw new IllegalStateException(
              s"StreamingMinhash ingest contract violated: doc_id $lo " +
                s"arrived after $prevMax in the same bucket; ids must " +
                "ascend across micro-batches for stream==batch equality")
          }
          incoming.foreach { x =>
            if (!members.contains(x)) {
              members.foreach { y => out += ((y, x)) } // y < x by contract
              members += x
            }
          }
          state.update((members.toSeq,
            math.max(prevMax, incoming.lastOption.getOrElse(prevMax))))
          out.iterator
      }
      .toDF("doc_a", "doc_b")
  }

  /** The dedup snapshot: distinct the accumulated candidate log and run
    * the batch path's own exact-Jaccard verification — output schema and
    * every value are [[TextOps.minhashPairs]]'s. */
  def snapshotPairs(documents: DataFrame, candidates: DataFrame,
                    n: Int = 5, threshold: Double = 0.7): DataFrame =
    TextOps.verifyCandidatePairs(documents, candidates, n, threshold)
}
