package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Trace-context propagation (reference: pspf/telemetry.py:108-118 —
  * inject the current trace context into every emitted payload, extract
  * it on consume so spans parent across topic hops).
  *
  * In a relational engine the context is ordinary columns: `_trace_id`
  * identifies the end-to-end flow and survives every hop (emit → topic →
  * consume → DLQ → replay — DLQ enrichment keeps all columns, replay
  * strips only the `_error`-family, never the trace); `_span_id` is
  * re-minted per hop, parenting to the previous hop's span. Random ids
  * (uuid) match tracing semantics — a task retry re-minting a span id
  * is the same behavior as any re-invoked span. */
object Trace {
  val TraceIdCol = "_trace_id"
  val SpanIdCol = "_span_id"
  val ParentSpanIdCol = "_parent_span_id"

  /** Inject on emit: start a trace for rows without one, keep the
    * existing trace for rows already carrying context (the reference
    * injects the CURRENT context, propagating inbound traces). */
  def inject(df: DataFrame): DataFrame = {
    val withTrace =
      if (df.columns.contains(TraceIdCol))
        df.withColumn(TraceIdCol, coalesce(col(TraceIdCol), expr("uuid()")))
      else df.withColumn(TraceIdCol, expr("uuid()"))
    if (withTrace.columns.contains(SpanIdCol)) childSpan(withTrace)
    else withTrace
      .withColumn(SpanIdCol, expr("uuid()"))
      .withColumn(ParentSpanIdCol, lit(null).cast("string"))
  }

  /** New hop: current span becomes the parent, a fresh span id is
    * minted, the trace id is untouched. */
  def childSpan(df: DataFrame): DataFrame =
    df.withColumn(ParentSpanIdCol, col(SpanIdCol))
      .withColumn(SpanIdCol, expr("uuid()"))

  /** Drop trace columns (e.g. before handing rows to user code that
    * declares a closed schema). */
  def strip(df: DataFrame): DataFrame =
    Seq(TraceIdCol, SpanIdCol, ParentSpanIdCol).foldLeft(df)(_ drop _)
}
