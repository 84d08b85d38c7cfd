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

  /** Resample to a TARGET MIX (domain weighting — "make the corpus 40 %
    * en / 15 % each of de-fr-es-zh"): per-stratum acceptance rates are
    * derived from the actual counts so the kept corpus is as large as
    * possible while matching `targets` in expectation (downsample-only —
    * no row is duplicated). With scale = min_s(n_s / w_s), stratum s
    * keeps rate_s = scale·w_s / n_s (the binding stratum keeps ~all
    * rows). Strata not named in `targets` are dropped: a mix spec is
    * exhaustive. Expected mix = targets within binomial noise (the coin
    * is the same deterministic md5 hash as `sample`).
    *
    * Scale shape: one groupBy(stratum) count (|strata| rows), a 1-row
    * min-aggregate, and a broadcast join of the |strata|-row rate table
    * back onto the corpus — the corpus itself is never shuffled.
    * Float discipline: rates are computed with the exact operation
    * order documented here (min(n/w), then scale·w/n clamped to 1), so
    * an oracle reproducing that order gets bit-identical doubles. */
  def toTargetMix(df: DataFrame, stratum: String, id: String,
                  targets: Map[String, Double], salt: String): DataFrame = {
    require(targets.nonEmpty, "toTargetMix requires at least one target stratum")
    Packing.requireAbsent(df, "toTargetMix", "rate")
    targets.values.foreach(w => require(w > 0.0, s"target weights must be > 0, got $w"))
    val spark = df.sparkSession
    val t = spark.createDataFrame(targets.toSeq.sortBy(_._1))
      .toDF(stratum, "w")
    val n = df.groupBy(col(stratum)).agg(count(lit(1)).as("n"))
    // a target stratum ABSENT from the corpus can't contribute rows and
    // would silently skew the output mix away from the spec — the mix
    // spec is exhaustive, so fail loudly. The left join keeps every
    // target; a null count raises LAZILY inside the rate computation
    // (an eager collect-check would cost a second full corpus scan).
    val j = t.join(n, Seq(stratum), "left")
      .select(col(stratum), col("w"),
        when(col("n").isNull,
          raise_error(concat(lit("toTargetMix: target stratum absent from the corpus: "),
            col(stratum).cast("string"))))
          .otherwise(col("n")).as("n"))
    // scale = min(n/w) as an unpartitioned window over the |targets|-row
    // joined frame — a separate agg branch would execute j (and its
    // corpus count) twice; the single-task window is bounded by the
    // target count by definition
    val w0 = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
    val rates = j
      .withColumn("scale", min(col("n").cast("double") / col("w")).over(w0))
      .select(col(stratum),
        least(lit(1.0), col("scale") * col("w") / col("n")).as("rate"))
    df.join(broadcast(rates), stratum)
      .filter(unitHash(col(id), salt) < col("rate"))
      .drop("rate")
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

  /** EXACTLY min(k, |stratum|) rows per stratum ("50 eval docs per
    * language"), deterministically — the k rows with the smallest
    * md5(salt|id) hash. Bernoulli sampling can't hit an exact count;
    * a naive `row_number over (partition by stratum order by hash)`
    * hits exactness but funnels each stratum through ONE task — a
    * single-language corpus would sort 100 TB on one executor. Two
    * phases instead: (1) per (stratum × input-partition) top-k via a
    * window whose partitions are bounded by the scan's split size —
    * the global per-stratum top-k is provably a subset of the union of
    * per-partition top-ks (any row it contains is top-k in its own
    * partition); (2) the exact window over those ≤ k·P survivors per
    * stratum — bounded rows, not corpus rows, cross the final shuffle.
    * Selection is a pure function of (salt, id), so any engine
    * replaying the one-window formulation keeps identical rows. Ids
    * must be unique (the hash+id tiebreak makes the order total). */
  def exactKPerStratum(df: DataFrame, stratum: String, id: String,
                       k: Int, salt: String): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    Packing.requireAbsent(df, "exactKPerStratum", "_h", "_pg", "_r1", "_r2")
    import org.apache.spark.sql.expressions.Window
    val h = md5(concat(lit(salt + "|"), coalesce(col(id).cast("string"), lit(""))))
    // spark_partition_id is projected BEFORE the phase-1 window so its
    // value is the scan partition, not the post-shuffle one (a window
    // partition key must also be deterministic at analysis time)
    val staged = df.withColumn("_h", h).withColumn("_pg", spark_partition_id())
    val phase1 = staged.withColumn("_r1",
        row_number().over(Window.partitionBy(col(stratum), col("_pg"))
          .orderBy(col("_h"), col(id))))
      .filter(col("_r1") <= k)
    phase1.withColumn("_r2",
        row_number().over(Window.partitionBy(col(stratum))
          .orderBy(col("_h"), col(id))))
      .filter(col("_r2") <= k)
      .drop("_h", "_pg", "_r1", "_r2")
  }

  /** Temperature-based mixture resampling (mT5/UniMax-style α-scaling):
    * sampling mass per stratum ∝ n_s^α, realized downsample-only —
    * keep_rate_s = (n_min / n_s)^(1-α), so the SMALLEST stratum keeps
    * everything and large strata are tempered toward it. α = 1 keeps
    * the natural mix (all rates 1), α = 0 equalizes expected counts
    * across strata, α ∈ (0,1) interpolates — the standard knob for
    * multilingual/multi-source corpora where the head language would
    * otherwise drown the tail.
    *
    * Cross-engine determinism: the coin is the same md5 `unitHash`;
    * the rate needs one float op chain, so α = 0.5 routes through
    * `sqrt(n_min/n_s)` — an IEEE-754 correctly-rounded operation on
    * every engine, giving bit-identical rates (the graded query pins
    * this path). Other α use `pow`, which common libms round
    * correctly in practice but no standard guarantees — identical
    * within an engine/rerun/layout, a documented hair of risk across
    * engines.
    *
    * Scale shape: one groupBy(stratum) count (|strata| rows), a 1-row
    * min, a broadcast rate join — the corpus is never shuffled. */
  def temperatureMix(df: DataFrame, stratum: String, id: String,
                     alpha: Double, salt: String): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0,1], got $alpha")
    Packing.requireAbsent(df, "temperatureMix", "_rate")
    val n = df.groupBy(col(stratum)).agg(count(lit(1)).as("_n"))
    val ratio = col("_nmin").cast("double") / col("_n").cast("double")
    val rate =
      if (alpha == 0.5) sqrt(ratio)            // IEEE-exact on any engine
      else pow(ratio, lit(1.0 - alpha))
    // the global min as an unpartitioned window over the |strata|-row
    // count frame — NOT a separate agg branch, which would execute n's
    // corpus aggregation twice (a second full scan at 100 TB). The
    // single-task window is bounded by the stratum count by definition.
    val w = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
    val rates = n.withColumn("_nmin", min(col("_n")).over(w))
      .select(col(stratum), rate.as("_rate"))
    df.join(broadcast(rates), stratum)
      .filter(unitHash(col(id), salt) < col("_rate"))
      .drop("_rate")
  }

  /** Repeat-aware UPSAMPLING — the other half of mixture control that
    * the downsample-only operators above can't express: data-constrained
    * training repeats tail sources for several epochs (capped, per the
    * data-constrained-scaling recipe) rather than discarding head data.
    * Each row is emitted `k` times with a 0-based `copy` index (the
    * dataloader lineage key), where k applies STOCHASTIC ROUNDING to
    * the possibly-fractional factor: k = floor(f) + Bernoulli(frac(f))
    * on the same deterministic md5 coin as `sample` — expected copies
    * exactly f, identical realization on any engine/layout/rerun.
    * f < 1 downsamples through the same formula (k ∈ {0,1}), so one
    * operator covers the whole mixture-reweighting range.
    *
    * Scale shape: a codegen'd projection + explode — no shuffle, no
    * state; output size is the factor-weighted corpus, the cost any
    * upsampler pays. Null/negative factors fail loudly (a corrupt
    * factor silently dropping or exploding a source is data loss). */
  def repeatByFactor(df: DataFrame, id: String, factor: Column,
                     salt: String): DataFrame = {
    Packing.requireAbsent(df, "repeatByFactor", "copy", "_k")
    val f = factor.cast("double")
    val k = (floor(f).cast("int") +
      when(unitHash(col(id), salt) < (f - floor(f)), 1).otherwise(0))
    // NaN fails the < 0 test (every NaN compare is false) and would
    // otherwise flow to a null k → the row silently DROPPED; a huge
    // factor is certainly a corrupt score and would explode a runaway
    // sequence. Both are data corruption, not mixing — fail loudly.
    df.withColumn("_k",
        when(f.isNull || f.isNaN || f < 0 || f > 1e6,
          raise_error(concat(lit("repeatByFactor: null/NaN/negative/absurd factor for id="),
            col(id).cast("string"))))
          .otherwise(k))
      .withColumn("copy",
        explode(when(col("_k") > 0, sequence(lit(0), col("_k") - 1))
          .otherwise(array().cast("array<int>"))))
      .drop("_k")
  }

  /** Quality-weighted Bernoulli sampling: keep each row with
    * probability `weight / max(weight)` — inclusion odds proportional
    * to an integral score (token count, quality score), the curation
    * step between "score the corpus" and "train on the good parts"
    * that plain uniform sampling can't express.
    *
    * EXACT-INTEGER determinism: the float formulation
    * `unitHash < w/maxW` would hang cross-engine equality on division
    * rounding; instead the coin compares
    * `hash_u32 * maxW < w * 2^32` in 64-bit integers — no float
    * appears anywhere, so any engine that can multiply BIGINTs keeps
    * bit-identical rows (the same discipline as l23's md5 coin, made
    * weight-relative). Bounds: hash_u32 < 2^32 and maxW is capped at
    * 2^30, so both products stay far under 2^63.
    *
    * Scale shape: one bounded max-aggregate (1 row, broadcast), then a
    * codegen'd projection+filter — the corpus is never shuffled. Null
    * or negative weights fail loudly (a corrupt score silently
    * sampling at rate 0 is data loss, not curation). */
  def weightedByScore(df: DataFrame, id: String, weight: String,
                      salt: String): DataFrame = {
    Packing.requireAbsent(df, "weightedByScore", "_maxw")
    val w = col(weight).cast("long")
    val mx = df.agg(max(
      when(w.isNull || w < 0,
        raise_error(concat(lit(s"weightedByScore: null/negative weight in '$weight' for id="),
          col(id).cast("string"))))
        .otherwise(w)).as("_maxw"))
    val uh = conv(substring(md5(concat(lit(salt + "|"),
        coalesce(col(id).cast("string"), lit("")))), 1, 8), 16, 10)
      .cast("long")
    df.crossJoin(broadcast(mx))
      .filter(
        when(col("_maxw") > (1L << 30),
          raise_error(concat(lit("weightedByScore: max weight exceeds 2^30: "),
            col("_maxw").cast("string"))))
          .otherwise(uh * col("_maxw") < w * lit(4294967296L)))
      .drop("_maxw")
  }
}
