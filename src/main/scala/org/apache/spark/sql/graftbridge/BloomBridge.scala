package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.functions.xxhash64
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/**
 * Column wrappers for Spark's engine-native Bloom-filter expressions
 * (`BloomFilterAggregate` / `BloomFilterMightContain`, the pair behind
 * Catalyst's runtime row-group filters). Both are `private[sql]`-ish
 * internals with no public Column API, hence this bridge lives next to
 * [[Bridge]] inside the sql package tree. Items are keyed by
 * `xxhash64(key)` (seed 42, the public `functions.xxhash64`) on BOTH the
 * build and probe side, matching how the runtime-filter rule feeds these
 * expressions; membership tests are codegen'd and the serialized filter
 * is planned as a foldable binary literal (deserialized once per task).
 */
object BloomBridge {

  /** Aggregate column: serialized Bloom filter (binary) over
    * `xxhash64(key)` of the input rows, sized for `expectedItems` at
    * false-positive rate `fpp`. Returns SQL NULL on zero input rows. */
  def bloomAgg(key: Column, expectedItems: Long, fpp: Double): Column = {
    require(expectedItems > 0, s"expectedItems must be > 0, got $expectedItems")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val numBits = BloomFilter.optimalNumOfBits(expectedItems, fpp)
    ExpressionUtils.column(
      new BloomFilterAggregate(
        ExpressionUtils.expression(xxhash64(key)),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression())
  }

  /** Predicate column: might `key` be in the serialized filter built by
    * [[bloomAgg]]? NULL key → NULL (never a spurious true/false). False
    * positives possible (rate ≈ fpp at capacity); false negatives are
    * impossible — the contract every pruning caller relies on. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    ExpressionUtils.column(
      BloomFilterMightContain(Literal.create(bloom, BinaryType),
        ExpressionUtils.expression(xxhash64(key))))
}
