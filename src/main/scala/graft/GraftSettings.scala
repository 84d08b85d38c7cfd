package graft

/** Env-driven engine configuration with legacy aliasing (reference:
  * pspf/settings.py:25-109 — namespaced vars with `__` nesting, legacy
  * unprefixed aliases kept for backward compatibility with namespaced
  * names taking precedence, lenient numeric parsing that falls back to
  * defaults, and a production-env validation warning).
  *
  * Spark analog of the nested blocks: the backend block configures the
  * default Connector, the telemetry block the StreamingQueryListener
  * surface (graft.streaming.Telemetry).
  */
final case class TelemetrySettings(
    enabled: Boolean = false,
    serviceName: String = "graft-service")

final case class GraftSettings(
    env: String = "dev",
    defaultBatchSize: Int = 10,     // reference DEFAULT_BATCH_SIZE → maxFilesPerTrigger-ish admission
    pollIntervalMs: Long = 100L,    // reference DEFAULT_POLL_INTERVAL (s → ms) → ProcessingTime trigger
    maxRetries: Int = 3,            // reference DLO_MAX_RETRIES → Reliability.DefaultMaxRetries
    shufflePartitions: Int = 32,
    broadcastThresholdBytes: Long = 64L * 1024 * 1024,
    checkpointRoot: Option[String] = None,
    telemetry: TelemetrySettings = TelemetrySettings()) {

  /** Reference validate_production: warn, don't fail. */
  def validationWarnings: Seq[String] =
    if (env == "prod" && checkpointRoot.isEmpty)
      Seq("GRAFT_CHECKPOINT_ROOT is not set in production environment!")
    else Nil

  /** Trigger for continuously-running consumption: the reference's poll
    * cadence (DEFAULT_POLL_INTERVAL 0.1 s, pspf/settings.py:37 /
    * pspf/processor.py:168-188). */
  def continuousTrigger: org.apache.spark.sql.streaming.Trigger =
    org.apache.spark.sql.streaming.Trigger.ProcessingTime(pollIntervalMs)

  /** Read options applying the reference's per-poll batch_size
    * (DEFAULT_BATCH_SIZE, pspf/settings.py:36) as graftlog admission
    * control — pass to readStream.options(...). */
  def graftlogReadOptions: Map[String, String] =
    Map("maxRecordsPerTrigger" -> defaultBatchSize.toString)
}

object GraftSettings {

  /** Namespaced name first (`GRAFT_…`), then the legacy alias, then the
    * default — the reference's map_legacy_environment precedence. */
  private def pick(env: Map[String, String], key: String, legacy: String*): Option[String] =
    (key +: legacy).iterator.flatMap(env.get).nextOption()

  /** Lenient parses: a garbage value falls back to the default (the
    * reference swallows conversion errors the same way) — including for
    * booleans, where an unrecognized token keeps the default instead of
    * silently meaning false. */
  private def int(v: Option[String], d: Int): Int = v.flatMap(_.toIntOption).getOrElse(d)
  private def long(v: Option[String], d: Long): Long = v.flatMap(_.toLongOption).getOrElse(d)
  private def bool(v: Option[String], d: Boolean): Boolean =
    v.map(_.trim.toLowerCase) match {
      case Some(s) if Set("true", "1", "yes").contains(s) => true
      case Some(s) if Set("false", "0", "no").contains(s) => false
      case _ => d
    }

  def fromEnv(env: Map[String, String] = sys.env): GraftSettings = {
    val d = GraftSettings()
    GraftSettings(
      env = pick(env, "GRAFT_ENV", "PSPF_ENV").getOrElse(d.env),
      defaultBatchSize =
        int(pick(env, "GRAFT_DEFAULT_BATCH_SIZE", "DEFAULT_BATCH_SIZE"), d.defaultBatchSize),
      pollIntervalMs =
        pick(env, "GRAFT_POLL_INTERVAL_MS").flatMap(_.toLongOption)
          // legacy name carries the REFERENCE unit — seconds
          // (DEFAULT_POLL_INTERVAL=0.1, pspf/settings.py:37) → convert
          .orElse(pick(env, "DEFAULT_POLL_INTERVAL").flatMap(_.toDoubleOption)
            .map(s => (s * 1000).toLong))
          .getOrElse(d.pollIntervalMs),
      maxRetries = int(pick(env, "GRAFT_MAX_RETRIES", "DLO_MAX_RETRIES"), d.maxRetries),
      shufflePartitions =
        int(pick(env, "GRAFT_SHUFFLE_PARTITIONS"), d.shufflePartitions),
      broadcastThresholdBytes =
        long(pick(env, "GRAFT_BROADCAST_THRESHOLD"), d.broadcastThresholdBytes),
      checkpointRoot = pick(env, "GRAFT_CHECKPOINT_ROOT"),
      telemetry = TelemetrySettings(
        enabled = bool(pick(env, "GRAFT_TELEMETRY__ENABLED", "OTEL_ENABLED"),
          d.telemetry.enabled),
        serviceName = pick(env, "GRAFT_TELEMETRY__SERVICE_NAME", "OTEL_SERVICE_NAME")
          .getOrElse(d.telemetry.serviceName)))
  }
}
