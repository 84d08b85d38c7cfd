package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's tuned defaults.
  *
  * Designed for a real multi-executor cluster; tested on `local[N]`.
  * AQE is on so skewed shuffles re-plan at runtime (skew-join split,
  * partition coalescing) — at 100 TB these matter far more than at sf0.1.
  */
object GraftSession {
  /** Shared tuning applied to any builder (local or cluster). Knobs come
    * from GraftSettings (env-driven, reference pspf/settings.py) instead
    * of hardcoded values; the explicit `shufflePartitions` parameter
    * (driver contract: match local core count) wins over the env. */
  def tune(b: SparkSession.Builder, shufflePartitions: Int,
           settings: GraftSettings = GraftSettings.fromEnv()): SparkSession.Builder = {
    settings.validationWarnings.foreach(w => System.err.println(s"[graft] WARNING: $w"))
    b.config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", settings.broadcastThresholdBytes.toString)
      .config("spark.ui.enabled", "false")
  }

  /** Fully settings-driven variant (GRAFT_SHUFFLE_PARTITIONS etc.). */
  def tune(b: SparkSession.Builder, settings: GraftSettings): SparkSession.Builder =
    tune(b, settings.shufflePartitions, settings)

  /** Local session for tests / verify / bench, with the engine's SQL
    * functions registered (vec_dot, simhash32). */
  def local(cores: Int = Runtime.getRuntime.availableProcessors.min(32)): SparkSession = {
    val s = tune(
      SparkSession.builder().master(s"local[$cores]").appName("graft")
        .withExtensions(new GraftExtensions),
      shufflePartitions = cores
    ).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
