package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.collection.concurrent.TrieMap

/** Event envelope mirroring the reference's `BaseEvent`
  * (reference: pspf/schema.py:8-26 — event_id/event_type/timestamp/
  * payload/partition/offset, open schema).
  *
  * The open `extra="allow"` dict becomes: a typed struct when a schema is
  * registered for the event_type, plus the raw JSON string kept alongside
  * so unregistered extra fields are never lost.
  */
case class Event(
    event_id: String,
    event_type: String,
    timestamp: java.sql.Timestamp,
    payload: String, // raw JSON — dynamic/open part
    partition: Option[Int],
    offset: Option[String])

object Event {
  val schema: StructType = StructType(Seq(
    StructField("event_id", StringType),
    StructField("event_type", StringType),
    StructField("timestamp", TimestampType),
    StructField("payload", StringType),
    StructField("partition", IntegerType),
    StructField("offset", StringType)))
}

/** Dynamic event_type → schema registry with open-schema fallback
  * (reference: pspf/schema.py:28-57 registry dispatch,
  * docs/schema-evolution.md:15-57 evolution policy).
  *
  * `parse` replaces the reference's raise→retry→DLQ path with Spark's
  * PERMISSIVE JSON parsing: rows whose payload fails their registered
  * schema keep a `_corrupt` flag for the caller to route to the DLQ leg
  * (see Reliability.scala).
  */
final class SchemaRegistry {
  private val byType = TrieMap.empty[String, StructType]

  def register(eventType: String, schema: StructType): Unit = byType.put(eventType, schema)

  /** Register-time evolution gate (reference: the registry's
    * compatibility-check hook, pspf/utils/schema_registry.py:18-34,
    * with the real additive policy from docs/schema-evolution.md
    * instead of the reference's field-count heuristic): replacing a
    * type's schema requires the new one to be additively compatible,
    * else the registration throws and the old schema stays. */
  def registerChecked(eventType: String, schema: StructType): Unit = {
    // CAS loop: check-then-put on the concurrent map would let two
    // racing registrations each validate against the SAME old schema
    // and both win — the replace/putIfAbsent retry validates against
    // exactly the schema being replaced
    while (true) {
      byType.get(eventType) match {
        case None =>
          if (byType.putIfAbsent(eventType, schema).isEmpty) return
        case Some(old) =>
          if (!compatible(old, schema))
            throw new IllegalArgumentException(
              s"incompatible schema evolution for '$eventType': every existing field must " +
                "keep its type and new fields must be nullable")
          if (byType.replace(eventType, old, schema)) return
      }
    }
  }
  def schemaFor(eventType: String): Option[StructType] = byType.get(eventType)
  def registered: Set[String] = byType.keySet.toSet

  /** Additive-evolution compatibility: every old field must survive with
    * the same type; new fields must be nullable (reference:
    * docs/schema-evolution.md additive-with-defaults policy). */
  def compatible(oldS: StructType, newS: StructType): Boolean = {
    val newFields = newS.fields.map(f => f.name -> f).toMap
    oldS.fields.forall(f => newFields.get(f.name).exists(_.dataType == f.dataType)) &&
      newS.fields.filterNot(f => oldS.fieldNames.contains(f.name)).forall(_.nullable)
  }

  /** Parse `payload` per registered event_type into a `parsed` struct
    * column (null when the type is unregistered — open fallback — and a
    * `_corrupt` flag when a registered schema failed to parse). One pass,
    * no per-type job: the dispatch is a single when-chain, fully
    * codegen'd. */
  def parse(df: DataFrame): DataFrame = {
    val types = byType.readOnlySnapshot().toSeq.sortBy(_._1)
    if (types.isEmpty)
      df.withColumn("parsed", lit(null).cast(StringType)).withColumn("_corrupt", lit(false))
    else {
      // Parsed values are re-serialized to canonical JSON so one string
      // column can host heterogeneous typed shapes. Malformed payloads are
      // detected via PERMISSIVE mode's corrupt-record column (from_json
      // yields an all-null struct, not null, on bad input — the corrupt
      // column is the reliable signal). Unregistered types pass through
      // as open-schema: parsed = null, not corrupt.
      //
      // Each type's from_json is materialized ONCE into a hidden column;
      // parsed/_corrupt are projections over that bound reference, so
      // the JSON isn't parsed twice per row in the hot path.
      val crField = "_corrupt_record"
      val opts = Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> crField)
      // index-keyed hidden names: sanitizing the type name could collide
      // ("order.created" vs "order_created" → same column, wrong schema)
      val hidden = types.zipWithIndex.map { case ((t, _), i) => t -> s"_parsed_$i" }.toMap
      val withParsed = types.foldLeft(df) { case (d, (t, s)) =>
        d.withColumn(hidden(t),
          from_json(col("payload"), StructType(s.fields :+ StructField(crField, StringType)), opts))
      }
      val corrupt = types.map { case (t, _) =>
        col("event_type") === t && col("payload").isNotNull &&
          col(hidden(t)).getField(crField).isNotNull
      }.reduce(_ || _)
      val parsed = types.foldRight(lit(null).cast(StringType)) { case ((t, _), acc) =>
        when(col("event_type") === t, to_json(col(hidden(t)).dropFields(crField))).otherwise(acc)
      }
      types.foldLeft(
        withParsed.withColumn("parsed", parsed)
          .withColumn("_corrupt", coalesce(corrupt, lit(false)))
      ) { case (d, (t, _)) => d.drop(hidden(t)) }
    }
  }
}
