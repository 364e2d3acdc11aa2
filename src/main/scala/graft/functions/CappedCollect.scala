package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/**
 * Bounded bucket collector: collects up to `cap` (doc_id, tag) members per
 * group while counting ALL members. The skew-proof core of candidate
 * generation — a degenerate bucket (millions of identical boilerplate
 * pages in one LSH band) costs O(cap) memory and is reported by its true
 * count instead of OOM-ing a task or exploding into O(m²) join rows.
 *
 * This is the scale-safe successor of the reference's
 * too-many-candidates guard (classes/RecordManager.php:1402-1410: cap
 * 1000 per key, repeat-offender memo): one shuffle of the band table,
 * bounded buffers, per-bucket pair expansion afterwards.
 */
final case class CappedBuf(count: Long, ids: List[Long], tags: List[Long])

class CappedCollect(cap: Int)
    extends Aggregator[(Long, Long), CappedBuf, CappedBuf] {

  override def zero: CappedBuf = CappedBuf(0L, Nil, Nil)

  override def reduce(b: CappedBuf, in: (Long, Long)): CappedBuf =
    // O(1) kept-length check: while the buffer is below the keep bound,
    // count == ids.length, so comparing count avoids an O(cap) List.size
    // walk per input row (a degenerate m-member bucket would otherwise
    // cost O(m*cap) traversals inside one task — the exact skew case this
    // collector exists to absorb). keep bound = cap + 1 so finish/filter
    // can distinguish "exactly cap" from "over cap".
    if (b.count <= cap) CappedBuf(b.count + 1, in._1 :: b.ids, in._2 :: b.tags)
    else b.copy(count = b.count + 1)

  override def merge(a: CappedBuf, b: CappedBuf): CappedBuf = {
    val keep = cap + 1
    CappedBuf(a.count + b.count,
      (a.ids ++ b.ids).take(keep),
      (a.tags ++ b.tags).take(keep))
  }

  override def finish(r: CappedBuf): CappedBuf = r

  override def bufferEncoder: Encoder[CappedBuf] = Encoders.product[CappedBuf]
  override def outputEncoder: Encoder[CappedBuf] = Encoders.product[CappedBuf]
}
