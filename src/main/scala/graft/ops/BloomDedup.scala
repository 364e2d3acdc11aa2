package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.BloomBridge

/** Incremental crawl dedup against a seen-corpus key set, Bloom-pruned:
  * the standard pattern for "drop everything we already have" when the
  * seen side is far too large to broadcast-join (reference analog: the
  * ingest-time existence + content-hash skip probe per record,
  * classes/RecordManager.php:1059-1066 — a per-row Mongo `findOne`; here
  * one sketch build + a map-side codegen probe).
  *
  * Semantics are EXACT set difference (`incoming` rows whose key is not
  * in `seen`), not approximate: the Bloom filter only PRUNES — a `false`
  * probe is definitely-new (Bloom filters have no false negatives), and
  * the `true` side (true members + ≈fpp false positives) is re-checked
  * with an exact left-anti join. The filter therefore changes the plan,
  * never the answer, and the op is DuckDB-oracle-checkable.
  *
  * Scale shape (the part that must survive 100 TB):
  *   - Without the sketch, `incoming ⟕̸ seen` shuffles BOTH full sides.
  *     With it, the anti-join's left side shrinks from |incoming| to
  *     |incoming ∩ seen| + fpp·|new| — on a crawl increment that is
  *     mostly new, the expensive exact join runs on a sliver.
  *   - The filter is built with one `treeAggregate`-style pass over the
  *     seen keys (engine-native `BloomFilterAggregate`) and planned as a
  *     foldable binary literal: deserialized once per task, probed inside
  *     whole-stage codegen — no UDF, no per-row driver round-trip.
  *   - Sizing: ~9.6 bits/key at fpp 1% → 1e9 seen keys ≈ 1.2 GB, the
  *     practical single-filter ceiling (also raise
  *     `spark.sql.optimizer.runtime.bloomFilter.maxNumBits` past its 8 MiB
  *     default above ~7M keys). Beyond that, hash-range-partition the
  *     seen keys and run this op per range — the probe column is already
  *     `xxhash64(key)`, so range = top bits of the same hash.
  *   - Keys enter the sketch as 64-bit xxhash64 values; hash collisions
  *     are swallowed by the same exact re-check that removes Bloom false
  *     positives.
  */
object BloomDedup {

  /** `incoming` rows whose `keyCol` does not appear in `seen.keyCol`
    * (exact left-anti semantics; NULL keys are kept, as an anti-join
    * keeps them). `expectedItems` ≤ 0 → counted from `seen`. */
  def pruneNew(incoming: DataFrame, seen: DataFrame, keyCol: String = "content_hash",
               expectedItems: Long = -1L, fpp: Double = 0.01): DataFrame = {
    val keys = seen.select(col(keyCol)).where(col(keyCol).isNotNull)
    val n = if (expectedItems > 0) expectedItems else keys.count()
    if (n == 0) return incoming
    val bloom = keys.agg(BloomBridge.bloomAgg(col(keyCol), n, fpp).as("bf"))
      .head.getAs[Array[Byte]](0)
    if (bloom == null) return incoming
    // NULL probe → NULL; fold to false so null-keyed rows ride the cheap
    // definitely-new branch (matching left-anti's keep-nulls behavior)
    val maybeSeen = coalesce(BloomBridge.mightContain(bloom, col(keyCol)), lit(false))
    val definitelyNew = incoming.where(!maybeSeen)
    val survivors = incoming.where(maybeSeen)
      .join(keys.distinct(), Seq(keyCol), "left_anti")
    definitelyNew.unionByName(survivors)
  }
}
