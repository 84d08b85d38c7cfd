package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys at cluster scale.
  *
  * AQE's skew-join splitting handles storage-level skew at runtime; these
  * helpers handle *semantic* skew the planner can't see coming — a single
  * key holding 10% of 100 TB (the classic hot-user/hot-shingle problem in
  * dedup pipelines, cf. Dedup.ngramJaccardPairs' shingle join).
  *
  * Pattern: spread one logical key over `nSalts` physical shuffle keys,
  * then merge. Aggregations become two-phase (salted partial → final);
  * joins replicate the build side across salts so every salted probe row
  * still finds its matches.
  */
object Skew {

  /** Per-row salt from a content hash of all columns: deterministic
    * under stage retries (monotonically_increasing_id would re-number
    * rows after a lost-executor recompute and corrupt the two-phase
    * merge). Fully duplicate rows share a salt — residual skew only if
    * one exact row dominates, which salting can't fix anyway. */
  private def salt(df: DataFrame, n: Int): Column =
    pmod(hash(df.columns.toIndexedSeq.map(col): _*), lit(n)) // pmod is non-negative even for negative hashes

  /** Two-phase salted sum/count aggregation over a skewed key. Result is
    * identical to a direct groupBy (decimal/long merges are associative);
    * the first shuffle spreads each hot key across `nSalts` reducers. */
  def saltedSumCount(df: DataFrame, keyCols: Seq[String], valueCol: String,
                     nSalts: Int): DataFrame = {
    val keys = keyCols.map(col)
    df.withColumn("_salt", salt(df, nSalts))
      .groupBy(keys :+ col("_salt"): _*)
      .agg(sum(col(valueCol)).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(keys: _*)
      .agg(sum(col("_psum")).as(s"sum_$valueCol"), sum(col("_pcnt")).as("n"))
  }

  /** Skew-safe equi-join: salt the (large, skewed) left side, replicate
    * the right side across all salts. Same rows as a plain join for
    * inner / left joins; right/full outer would emit each unmatched
    * right row once per salt replica, hence the guard. */
  def saltedJoin(left: DataFrame, right: DataFrame,
                 leftKey: String, rightKey: String, nSalts: Int,
                 joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi")
      .contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left/left_semi join types (right rows are replicated), got $joinType")
    val l = left.withColumn("_lsalt", salt(left, nSalts))
    val r = right.withColumn("_rsalt",
      explode(array((0 until nSalts).map(i => lit(i.toLong)): _*)))
    l.join(r, l(leftKey) === r(rightKey) && l("_lsalt") === r("_rsalt"), joinType)
      .drop("_lsalt").drop("_rsalt")
  }
}
