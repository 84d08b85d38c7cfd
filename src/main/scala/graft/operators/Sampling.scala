package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation.
  *
  * `df.sample()` is partitioning- and seed-plumbing-dependent: the same
  * corpus resampled on a different cluster layout keeps DIFFERENT rows,
  * which poisons dedup caches, eval splits, and incremental reruns.
  * Membership here is a pure function of the row id: md5(salt|id)'s
  * first 8 hex chars, scaled to [0,1), compared against the stratum's
  * rate — any engine, any parallelism, any rerun keeps exactly the same
  * rows (same discipline as l15's md5-range splits). Everything is a
  * codegen'd projection + filter: zero shuffle, pushes below wider
  * plans when Catalyst can.
  */
object Sampling {

  /** Uniform [0,1) hash of (salt, id) — the sampling coin. A null id
    * hashes over the empty string rather than null-poisoning the
    * filter: `filter(null < rate)` would silently drop null-id rows
    * even at rate 1.0, which is data loss, not sampling. All null-id
    * rows share one coin (they are indistinguishable to a
    * deterministic sampler by construction). */
  def unitHash(id: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt + "|"), coalesce(id.cast("string"), lit("")))), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)

  /** Keep rows with probability `rate`, deterministically. */
  def sample(df: DataFrame, id: String, rate: Double, salt: String): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    df.filter(unitHash(col(id), salt) < rate)
  }

  /** Per-stratum rates (e.g. downsample an over-represented language):
    * rows in a stratum named in `rates` keep with that probability,
    * everything else with `defaultRate`. The rate dispatch is a
    * when-chain over the stratum column — one codegen'd pass, no join
    * against a rates table (broadcast-join a rates DataFrame instead
    * when strata are dynamic/thousands). */
  def stratified(df: DataFrame, stratum: String, id: String,
                 rates: Map[String, Double], salt: String,
                 defaultRate: Double = 1.0): DataFrame = {
    (rates.values.toSeq :+ defaultRate).foreach(r =>
      require(r >= 0.0 && r <= 1.0, s"rates must be in [0,1], got $r"))
    val rate = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultRate)) {
      case (acc, (k, r)) => when(col(stratum) === k, lit(r)).otherwise(acc)
    }
    df.filter(unitHash(col(id), salt) < rate)
  }
}
