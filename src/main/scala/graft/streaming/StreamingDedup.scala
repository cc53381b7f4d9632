package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming near-duplicate detection — the streaming twin of the
  * batch MinHash-LSH pipeline (q22): documents arrive on a stream,
  * each is signed row-locally (tokenize → 3-gram shingles → 16
  * minhashes → 4 band signatures, identical scheme and md5 hashing to
  * [[graft.dedup.DedupOps]]), and a stateful bucket operator keeps the
  * doc-ids seen per (band, signature) bucket, emitting candidate
  * pairs the moment a new arrival collides with history.
  *
  * Scale shape: signatures are computed map-side with no shuffle; the
  * only stateful shuffle keys by bucket, so state per key is a small
  * id set bounded by bucket occupancy. In production the state would
  * carry a watermark/TTL (dropDuplicatesWithinWatermark-style) to
  * bound history; the exact-Jaccard verification of emitted candidates
  * stays a batch join against the document store.
  */
object StreamingDedup {

  case class Doc(doc_id: Long, text: String)
  /** A bucket collision: doc `i` < doc `j` share band `band`'s
    * signature. The same pair may surface from several bands —
    * consumers dedupe on (i, j). */
  case class CandidatePair(i: Long, j: Long, band: Long)

  /** Row-local band signatures — delegates to the shared
    * [[graft.dedup.MinHashLocal]] scheme (same code path the native
    * batch expressions use). Returns (band, sig); empty for docs with
    * fewer than 3 tokens. */
  def bandSignatures(text: String): Seq[(Long, String)] =
    graft.dedup.MinHashLocal.bandSigs(text).zipWithIndex
      .map { case (sig, b) => (b.toLong, sig) }.toSeq

  /** The stateful bucket operator: per (band, sig) bucket, remember
    * seen doc ids; each new arrival emits one candidate pair per
    * historical member (ordered i < j). */
  def candidates(docs: Dataset[Doc]): Dataset[CandidatePair] = {
    import docs.sparkSession.implicits._
    docs.flatMap(d => bandSignatures(d.text).map {
      case (band, sig) => (band, sig, d.doc_id)
    })
      .groupByKey(t => (t._1, t._2))
      .flatMapGroupsWithState[Set[Long], CandidatePair](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((band, _), rows, state: GroupState[Set[Long]]) =>
          val seen = state.getOption.getOrElse(Set.empty[Long])
          val arrived = rows.map(_._3).toSet
          val fresh = arrived -- seen
          val all = seen ++ fresh
          state.update(all)
          (for {
            n <- fresh.iterator
            o <- all.iterator if o != n
            if n > o || !fresh.contains(o) // emit each pair once
          } yield CandidatePair(math.min(n, o), math.max(n, o), band))
      }
  }
}
