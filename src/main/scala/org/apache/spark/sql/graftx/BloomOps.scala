package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Column API over Spark's internal bloom-filter expressions (the
  * machinery behind `InjectRuntimeFilter`, exposed for EXPLICIT
  * two-tier filtering — build a filter from a key set once, apply it
  * map-side before an expensive exact join).
  *
  * The aggregate is mergeable (TypedImperativeAggregate over
  * `org.apache.spark.util.sketch.BloomFilter`), so the build is one
  * partial-agg pass; the probe is a codegen'd predicate against the
  * broadcast sketch bytes. No false negatives ever — downstream exact
  * checks only ever see EXTRA candidates, never miss one.
  */
object BloomOps {

  /** Aggregate a column into bloom-filter bytes.
    * @param expectedItems sizing hint (items)
    * @param numBits       filter size in bits (~10 bits/item ≈ 1% fpp)
    */
  def bloomAgg(c: Column, expectedItems: Long, numBits: Long): Column =
    ExpressionUtils.column(new BloomFilterAggregate(
      new XxHash64(Seq(ExpressionUtils.expression(c))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Membership probe against [[bloomAgg]] bytes (no false negatives). */
  def mightContain(bloomBytes: Column, c: Column): Column =
    ExpressionUtils.column(BloomFilterMightContain(
      ExpressionUtils.expression(bloomBytes),
      new XxHash64(Seq(ExpressionUtils.expression(c)))))
}
