package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Column wrappers over Catalyst's own bloom-filter expression pair —
  * the same `BloomFilterAggregate` / `BloomFilterMightContain` machinery
  * Spark's InjectRuntimeFilter rule uses for runtime join pruning
  * (org.apache.spark.sql.catalyst.optimizer.InjectRuntimeFilter), made
  * available to graft operators directly. Fully relational: the filter
  * is built by ONE aggregate (a single binary row, bounded by numBits),
  * rides a broadcast to the probe side, and the membership test is a
  * codegen'd predicate — no driver-side sketch construction, no UDF.
  */
object BloomFunctions {

  /** Aggregate `c` (must be LongType — hash first, e.g. xxhash64) into a
    * serialized bloom filter sized for `expectedItems`. */
  def bloomAgg(c: Column, expectedItems: Long): Column =
    GraftBridge.column(
      new BloomFilterAggregate(GraftBridge.expression(c), expectedItems)
        .toAggregateExpression())

  /** The bloom filter built over `buildSide`'s column `c`, packaged the
    * only way `might_contain` accepts a non-literal filter: as a scalar
    * subquery over the one-row aggregate (InjectRuntimeFilter's own
    * wiring). The subquery executes once per query and its binary result
    * ships to every probe task. */
  def bloomOf(buildSide: DataFrame, c: Column, expectedItems: Long): Column =
    GraftBridge.column(ScalarSubquery(
      buildSide.agg(bloomAgg(c, expectedItems).as("bf")).queryExecution.analyzed,
      Seq.empty, org.apache.spark.sql.catalyst.expressions.NamedExpression.newExprId,
      Seq.empty, None, None, None))

  /** Membership probe: true if `v` (LongType, same hash as the build
    * side) might be in `bloom`; false means DEFINITELY absent — the
    * no-false-negatives guarantee exact post-verification relies on. */
  def mightContain(bloom: Column, v: Column): Column =
    GraftBridge.column(BloomFilterMightContain(
      GraftBridge.expression(bloom), GraftBridge.expression(v)))
}
