package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-registry ingest: the reference's event validation surface
  * (EventSchemaRegistry services/event_registry.py:15-32 + property
  * re-validation app.py:19-44) as a declarative Spark stage.
  *
  * Unknown event names → dead letter `unknown_event_type` (the
  * reference's 400, app.py:22-24); properties failing the registered
  * schema → dead letter `invalid_properties` (app.py:36-41). Valid rows
  * come out with a typed `props_parsed` struct.
  *
  * Invalid rows are routed, never thrown: a malformed record must not
  * kill a 100 TB scan (the reference instead drops the event and — via
  * its unset-logger bug — kills the consumer, event_processer.py:64-66;
  * divergence documented in SURVEY.md §2.9).
  */
object EventIngest {

  /** One registered event type: property schema + required fields
    * (pydantic required-field semantics). */
  final case class EventTypeSchema(
      name: String,
      schema: StructType,
      required: Seq[String])

  /** Registry bound to the driver `events` table — every type carries
    * a JSON `{"k": <int>}` payload; `view` is deliberately
    * unregistered to exercise the reject path (mirrors the reference's
    * closed-world registry, config.py:94-100). */
  val defaultRegistry: Seq[EventTypeSchema] = {
    val kSchema = StructType(Seq(StructField("k", LongType)))
    Seq(
      EventTypeSchema("click", kSchema, Seq("k")),
      EventTypeSchema("signup", kSchema, Seq("k")),
      EventTypeSchema("purchase", kSchema, Seq("k")),
      EventTypeSchema("error", kSchema, Seq("k")))
  }

  /** Classify + parse in one projection (no shuffle): adds
    * `props_parsed` (typed struct, null unless valid) and `ingest_status`
    * ∈ {valid, unknown_event_type, invalid_properties}. */
  def classify(raw: DataFrame, registry: Seq[EventTypeSchema] = defaultRegistry): DataFrame = {
    val byName = registry.groupBy(_.schema).view.mapValues(_.map(_.name)).toSeq
    // one from_json per distinct schema, selected by event type
    val parsed: Column = byName.foldLeft(lit(null).cast(byName.head._1)) {
      case (acc, (schema, names)) =>
        when(col("event_type").isin(names: _*),
          from_json(col("props"), schema)).otherwise(acc)
    }
    val requiredOk: Column = registry.map { ets =>
      col("event_type") === ets.name &&
        ets.required.map(f => col("props_parsed").getField(f).isNotNull)
          .foldLeft(lit(true))(_ && _)
    }.reduce(_ || _)
    val registered = col("event_type").isin(registry.map(_.name): _*)
    raw
      .withColumn("props_parsed", parsed)
      .withColumn("ingest_status",
        when(!registered, lit("unknown_event_type"))
          .when(col("props_parsed").isNull || !requiredOk, lit("invalid_properties"))
          .otherwise(lit("valid")))
  }

  /** The two output streams: typed valid events, and the dead letter
    * with its reject reason. */
  def parse(raw: DataFrame, registry: Seq[EventTypeSchema] = defaultRegistry)
      : (DataFrame, DataFrame) = {
    val c = classify(raw, registry)
    (c.filter(col("ingest_status") === "valid").drop("ingest_status"),
      c.filter(col("ingest_status") =!= "valid").drop("props_parsed")
        .withColumnRenamed("ingest_status", "reject_reason"))
  }
}
