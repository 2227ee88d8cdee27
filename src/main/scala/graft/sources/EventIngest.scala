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
    * ∈ {valid, unknown_event_type, invalid_properties}.
    *
    * Heterogeneous registries (the reference's per-type shapes —
    * zipcode for add_credit_card, amount for chargeback/purchase,
    * event.py:12-25) parse into ONE union-of-fields struct (the
    * SURVEY §1.4 mapping): each type's branch fills its own fields,
    * every other union field is null. Same-named fields must agree on
    * type across the registry (checked here, the closed-world
    * build-time check). */
  def classify(raw: DataFrame, registry: Seq[EventTypeSchema] = defaultRegistry): DataFrame = {
    val unionFields: Seq[StructField] = registry.flatMap(_.schema.fields)
      .groupBy(_.name).map { case (n, fs) =>
        val ts = fs.map(_.dataType).distinct
        require(ts.size == 1, s"conflicting types for props field $n: $ts")
        StructField(n, ts.head, nullable = true)
      }.toSeq.sortBy(_.name)
    val unionType = StructType(unionFields)
    val byName = registry.groupBy(_.schema).view.mapValues(_.map(_.name)).toSeq
    // ONE from_json per distinct schema, materialized as a temp column
    // so the union-struct rebuild below references the parse rather
    // than re-parsing per field (from_json is not cheap; CollapseProject
    // keeps the alias), then widened to the union struct (null struct
    // when unparseable — from_json yields null on malformed input)
    val withParses = byName.zipWithIndex.foldLeft(raw) {
      case (df, ((schema, _), i)) =>
        df.withColumn(s"__parse_$i", from_json(col("props"), schema))
    }
    val parsed: Column = byName.zipWithIndex
      .foldLeft(lit(null).cast(unionType)) {
        case (acc, ((schema, names), i)) =>
          val p = col(s"__parse_$i")
          val widened = struct(unionFields.map { f =>
            (if (schema.fieldNames.contains(f.name)) p.getField(f.name)
             else lit(null).cast(f.dataType)).as(f.name)
          }: _*)
          when(col("event_type").isin(names: _*),
            when(p.isNotNull, widened).otherwise(lit(null).cast(unionType)))
            .otherwise(acc)
      }
    val requiredOk: Column = registry.map { ets =>
      col("event_type") === ets.name &&
        ets.required.map(f => col("props_parsed").getField(f).isNotNull)
          .foldLeft(lit(true))(_ && _)
    }.reduce(_ || _)
    val registered = col("event_type").isin(registry.map(_.name): _*)
    withParses
      .withColumn("props_parsed", parsed)
      .withColumn("ingest_status",
        when(!registered, lit("unknown_event_type"))
          .when(col("props_parsed").isNull || !requiredOk, lit("invalid_properties"))
          .otherwise(lit("valid")))
      .drop(byName.indices.map(i => s"__parse_$i"): _*)
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

  /** Ingest health counters as `observe` metrics: computed INSIDE the
    * existing plan while rows flow (an accumulator per expression), not
    * by a second pass — at 100 TB a monitoring re-scan is the
    * difference between "free" and "doubles the bill". Batch callers
    * read them through an `org.apache.spark.sql.Observation` (pass the
    * same exprs to `df.observe(obs, ...)`); streaming callers get them
    * in every micro-batch's `StreamingQueryProgress.observedMetrics`
    * under `name` — the reject-rate feed a dead-letter alarm wants. */
  val metricExprs: Seq[Column] = Seq(
    count(lit(1)).as("n_total"),
    count(when(col("ingest_status") === "valid", 1)).as("n_valid"),
    count(when(col("ingest_status") === "unknown_event_type", 1))
      .as("n_unknown_type"),
    count(when(col("ingest_status") === "invalid_properties", 1))
      .as("n_invalid_props"))

  /** Attach the ingest counters to a classified frame (batch or
    * streaming — `observe` supports both). */
  def observed(classified: DataFrame, name: String = "ingest_metrics"): DataFrame =
    classified.observe(name, metricExprs.head, metricExprs.tail: _*)
}
