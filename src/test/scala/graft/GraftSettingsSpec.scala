package graft

import org.scalatest.funsuite.AnyFunSuite

/** Env-driven settings semantics (reference pspf/settings.py:25-109:
  * defaults, namespaced overrides, legacy aliases with namespaced
  * precedence, lenient parsing, prod validation warning). */
class GraftSettingsSpec extends AnyFunSuite {

  test("defaults match the reference's operational defaults") {
    val s = GraftSettings.fromEnv(Map.empty)
    assert(s.env == "dev")
    assert(s.defaultBatchSize == 10)    // DEFAULT_BATCH_SIZE
    assert(s.pollIntervalMs == 100L)    // DEFAULT_POLL_INTERVAL 0.1 s
    assert(s.maxRetries == 3)           // DLO_MAX_RETRIES
    assert(!s.telemetry.enabled)
    assert(s.validationWarnings.isEmpty)
  }

  test("namespaced vars override; legacy aliases honored; namespaced wins over legacy") {
    val legacyOnly = GraftSettings.fromEnv(Map("DLO_MAX_RETRIES" -> "7", "OTEL_ENABLED" -> "yes"))
    assert(legacyOnly.maxRetries == 7 && legacyOnly.telemetry.enabled)

    val both = GraftSettings.fromEnv(Map(
      "GRAFT_MAX_RETRIES" -> "5", "DLO_MAX_RETRIES" -> "7",
      "GRAFT_TELEMETRY__ENABLED" -> "false", "OTEL_ENABLED" -> "true",
      "GRAFT_TELEMETRY__SERVICE_NAME" -> "svc-a", "OTEL_SERVICE_NAME" -> "svc-b"))
    assert(both.maxRetries == 5)
    assert(!both.telemetry.enabled)
    assert(both.telemetry.serviceName == "svc-a")
  }

  test("lenient parsing: garbage numerics fall back to defaults; bools accept true/1/yes") {
    val s = GraftSettings.fromEnv(Map(
      "GRAFT_MAX_RETRIES" -> "not-a-number",
      "GRAFT_TELEMETRY__ENABLED" -> "1"))
    assert(s.maxRetries == 3)
    assert(s.telemetry.enabled)
    // explicit false tokens parse as false; unrecognized tokens keep the
    // default (indistinguishable here while the only bool default is
    // false — a default-true setting would pin the fallback direction)
    assert(!GraftSettings.fromEnv(Map("OTEL_ENABLED" -> "0")).telemetry.enabled)
    assert(!GraftSettings.fromEnv(Map("OTEL_ENABLED" -> "nope")).telemetry.enabled)
  }

  test("settings are consumable by the engine: trigger, admission options, retry default") {
    val s = GraftSettings.fromEnv(Map(
      "GRAFT_POLL_INTERVAL_MS" -> "250", "GRAFT_DEFAULT_BATCH_SIZE" -> "42"))
    assert(s.continuousTrigger ==
      org.apache.spark.sql.streaming.Trigger.ProcessingTime(250L))
    assert(s.graftlogReadOptions == Map("maxRecordsPerTrigger" -> "42"))
    // lazy engine default resolves through the same settings path
    assert(graft.streaming.Reliability.DefaultMaxRetries == GraftSettings.fromEnv().maxRetries)
  }

  test("prod without a checkpoint root warns (reference validate_production)") {
    val prod = GraftSettings.fromEnv(Map("GRAFT_ENV" -> "prod"))
    assert(prod.validationWarnings.exists(_.contains("GRAFT_CHECKPOINT_ROOT")))
    val ok = GraftSettings.fromEnv(Map("GRAFT_ENV" -> "prod", "GRAFT_CHECKPOINT_ROOT" -> "/ckpt"))
    assert(ok.validationWarnings.isEmpty)
  }
}
