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
/** Per-type evolution declarations (reference:
  * docs/schema-evolution.md:30-57 — `AliasChoices` renames and
  * `field_validator(mode='before')` coercions):
  *  - `aliases`: canonical field → old wire names still accepted; the
  *    first non-null among canonical-then-aliases wins (AliasChoices
  *    order semantics).
  *  - `coerced`: fields whose old wire TYPE differed (e.g. price sent
  *    as "42.5" or 42): parsed leniently as string — Spark's JSON
  *    string converter accepts any scalar token — then cast to the
  *    canonical type, so old and new wire formats both validate. A
  *    present-but-uncastable value flags `_corrupt` (the reference's
  *    ValidationError → DLQ path). Pure numeric widening (int → float)
  *    needs no declaration: Spark's JSON parser already accepts it.
  */
case class Evolution(
    aliases: Map[String, Seq[String]] = Map.empty,
    coerced: Set[String] = Set.empty)

final class SchemaRegistry {
  private val byType = TrieMap.empty[String, StructType]
  private val evolutions = TrieMap.empty[String, Evolution]

  // parse() appends its corrupt-record column to every wire schema; a
  // canonical field with that name would duplicate it inside from_json
  // far from the registration
  private def checkReserved(eventType: String, schema: StructType): Unit =
    if (schema.fieldNames.contains("_corrupt_record"))
      throw new IllegalArgumentException(
        s"schema for '$eventType' uses the reserved field name _corrupt_record")

  def register(eventType: String, schema: StructType): Unit = {
    checkReserved(eventType, schema)
    byType.put(eventType, schema)
  }

  /** Declare rename aliases / type coercions for a registered type.
    * Alias names must not collide with canonical fields (a payload
    * carrying both would silently shadow one) and every referenced
    * field must exist. */
  def registerEvolution(eventType: String, evo: Evolution): Unit = {
    val schema = byType.getOrElse(eventType,
      throw new IllegalArgumentException(s"no schema registered for '$eventType'"))
    val fields = schema.fieldNames.toSet
    val badField = (evo.aliases.keySet ++ evo.coerced).filterNot(fields)
    if (badField.nonEmpty)
      throw new IllegalArgumentException(
        s"evolution for '$eventType' references unknown fields: ${badField.mkString(", ")}")
    val allAliases = evo.aliases.values.flatten.toSeq
    // the corrupt-record column parse() appends to every wire schema is
    // reserved too — an alias named after it would duplicate the field
    // in from_json's schema, failing far from this registration
    val clash = allAliases.toSet.intersect(fields + "_corrupt_record")
    if (clash.nonEmpty)
      throw new IllegalArgumentException(
        s"evolution aliases for '$eventType' collide with canonical/reserved fields: ${clash.mkString(", ")}")
    if (allAliases.distinct.size != allAliases.size)
      throw new IllegalArgumentException(
        s"evolution for '$eventType' maps one alias to multiple fields")
    evolutions.put(eventType, evo)
  }

  /** Register-time evolution gate (reference: the registry's
    * compatibility-check hook, pspf/utils/schema_registry.py:18-34,
    * with the real additive policy from docs/schema-evolution.md
    * instead of the reference's field-count heuristic): replacing a
    * type's schema requires the new one to be additively compatible,
    * else the registration throws and the old schema stays. */
  def registerChecked(eventType: String, schema: StructType): Unit = {
    checkReserved(eventType, schema)
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
      val evos = evolutions.readOnlySnapshot().toMap
      // index-keyed hidden names: sanitizing the type name could collide
      // ("order.created" vs "order_created" → same column, wrong schema)
      val hidden = types.zipWithIndex.map { case ((t, _), i) => t -> s"_parsed_$i" }.toMap

      // WIRE schema per type: coerced fields parse as string (Spark's
      // JSON string converter accepts any scalar token, so every legacy
      // wire type lands), alias fields ride alongside with the same
      // wire type as their canonical field
      def wireSchema(t: String, s: StructType): StructType = {
        val evo = evos.getOrElse(t, Evolution())
        def wireType(f: StructField) = if (evo.coerced(f.name)) StringType else f.dataType
        val canon = s.fields.map(f => StructField(f.name, wireType(f), nullable = true))
        val aliased = s.fields.flatMap { f =>
          evo.aliases.getOrElse(f.name, Nil).map(a => StructField(a, wireType(f), nullable = true))
        }
        StructType(canon ++ aliased :+ StructField(crField, StringType))
      }
      // first-non-null of canonical-then-aliases (AliasChoices order)
      def wireVal(t: String, h: Column, f: String): Column =
        evos.get(t).flatMap(_.aliases.get(f)) match {
          case Some(as) => coalesce(h.getField(f) +: as.map(h.getField): _*)
          case None => h.getField(f)
        }
      // canonical struct: aliases folded in, coercions cast (try_cast:
      // an uncastable legacy value must flag _corrupt, not throw under
      // ANSI), alias/corrupt columns dropped
      def rebuilt(t: String, s: StructType, h: Column): Column = {
        val evo = evos.getOrElse(t, Evolution())
        var c = h
        s.fields.foreach { f =>
          val wire = wireVal(t, h, f.name)
          if (evo.coerced(f.name)) c = c.withField(f.name, wire.try_cast(f.dataType))
          else if (evo.aliases.contains(f.name)) c = c.withField(f.name, wire)
        }
        val drop = evo.aliases.values.flatten.toSeq :+ crField
        c.dropFields(drop: _*)
      }
      def corruptFor(t: String, s: StructType, h: Column): Column = {
        val evo = evos.getOrElse(t, Evolution())
        val coerceBad = s.fields.filter(f => evo.coerced(f.name)).map { f =>
          val wire = wireVal(t, h, f.name)
          wire.isNotNull && wire.try_cast(f.dataType).isNull
        }
        (h.getField(crField).isNotNull +: coerceBad).reduce(_ || _)
      }

      val withParsed = types.foldLeft(df) { case (d, (t, s)) =>
        d.withColumn(hidden(t), from_json(col("payload"), wireSchema(t, s), opts))
      }
      val corrupt = types.map { case (t, s) =>
        col("event_type") === t && col("payload").isNotNull &&
          corruptFor(t, s, col(hidden(t)))
      }.reduce(_ || _)
      val parsed = types.foldRight(lit(null).cast(StringType)) { case ((t, s), acc) =>
        when(col("event_type") === t, to_json(rebuilt(t, s, col(hidden(t))))).otherwise(acc)
      }
      types.foldLeft(
        withParsed.withColumn("parsed", parsed)
          .withColumn("_corrupt", coalesce(corrupt, lit(false)))
      ) { case (d, (t, _)) => d.drop(hidden(t)) }
    }
  }
}
