package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Signed multiset delta between two frames of identical schema — the
  * losslessness gate a round-trip (format rewrite, store migration,
  * compaction) runs before trusting its output: +1 per row of `got`,
  * −1 per row of `want`, grouped over EVERY column; any lost, invented,
  * duplicated, or value-drifted row leaves a non-zero group. Covers
  * both directions in ONE shuffle where `exceptAll` both ways pays
  * two. At 100 TB the gate runs per ingest file, not per corpus — the
  * shuffle is the check's inherent price at whatever granularity it
  * guards. */
object Delta {

  /** Number of (row-value) groups whose signed counts do not cancel —
    * 0 iff `got` and `want` are multiset-equal. Schema equality is
    * checked on (name, dataType) pairs, not names alone: a round-trip
    * that silently widened int→long or float→double would otherwise
    * pass via unionByName's implicit coercion. Nullability is NOT
    * compared — writers legitimately relax it and values still match. */
  def driftedGroups(got: DataFrame, want: DataFrame): Long = {
    require(got.columns.sameElements(want.columns),
      s"Delta compares identical schemas; got ${got.columns.mkString(",")} vs ${want.columns.mkString(",")}")
    val gotTypes  = got.schema.fields.map(f => (f.name, f.dataType))
    val wantTypes = want.schema.fields.map(f => (f.name, f.dataType))
    require(gotTypes.sameElements(wantTypes), {
      val diffs = gotTypes.zip(wantTypes).collect {
        case ((n, gt), (_, wt)) if gt != wt => s"$n: $gt vs $wt"
      }
      s"Delta: column types drifted — ${diffs.mkString("; ")}"
    })
    require(!got.columns.contains("_sgn"),
      "Delta: input already has reserved column _sgn — rename it first")
    val cols = got.columns.map(col).toSeq
    got.withColumn("_sgn", lit(1))
      .unionByName(want.withColumn("_sgn", lit(-1)))
      .groupBy(cols: _*).agg(sum(col("_sgn")).as("_d"))
      .filter(col("_d") =!= 0).count()
  }

  /** Loud-failure form: the gate every round-trip caller runs. */
  def assertLossless(got: DataFrame, want: DataFrame, label: String): Unit = {
    val drift = driftedGroups(got, want)
    require(drift == 0, s"$label round-trip lost or changed rows ($drift drifted groups)")
  }
}
