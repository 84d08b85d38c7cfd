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

  /** Uniform per-row salt, deterministic within a run. */
  private def salt(n: Int): Column = pmod(monotonically_increasing_id(), lit(n.toLong))

  /** Two-phase salted sum/count aggregation over a skewed key. Result is
    * identical to a direct groupBy (decimal/long merges are associative);
    * the first shuffle spreads each hot key across `nSalts` reducers. */
  def saltedSumCount(df: DataFrame, keyCols: Seq[String], valueCol: String,
                     nSalts: Int): DataFrame = {
    val keys = keyCols.map(col)
    df.withColumn("_salt", salt(nSalts))
      .groupBy(keys :+ col("_salt"): _*)
      .agg(sum(col(valueCol)).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(keys: _*)
      .agg(sum(col("_psum")).as(s"sum_$valueCol"), sum(col("_pcnt")).as("n"))
  }

  /** Skew-safe equi-join: salt the (large, skewed) left side, replicate
    * the right side across all salts. Same rows as a plain join. */
  def saltedJoin(left: DataFrame, right: DataFrame,
                 leftKey: String, rightKey: String, nSalts: Int,
                 joinType: String = "inner"): DataFrame = {
    val l = left.withColumn("_lsalt", salt(nSalts))
    val r = right.withColumn("_rsalt",
      explode(array((0 until nSalts).map(i => lit(i.toLong)): _*)))
    l.join(r, l(leftKey) === r(rightKey) && l("_lsalt") === r("_rsalt"), joinType)
      .drop("_lsalt").drop("_rsalt")
  }
}
