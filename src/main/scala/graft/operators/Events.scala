package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Event-stream tier over the `events` fixture: gap-based
  * sessionization and tumbling-window aggregation — the batch
  * equivalents of the Structured Streaming operators in
  * `graft.streaming` (same semantics, oracle-checkable here).
  *
  * Timestamps surface as epoch seconds (bigint) so the DuckDB compare
  * is representation-independent.
  */
object Events {

  /** Gap-based sessions: a new session starts when a user is idle longer
    * than `gapMinutes`. One shuffle on user_id; the lag/cumsum pattern
    * keeps everything inside two window passes over the same partition.
    */
  def sessionize(s: SparkSession, dir: String,
                 gapMinutes: Int = 30): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val epoch = unix_timestamp(col("ts"))
    val prev = lag(epoch, 1).over(w)
    val newSession = when(
      prev.isNull || (epoch - prev > gapMinutes * 60L), 1).otherwise(0)
    Tables.events(s, dir)
      .withColumn("new_s", newSession)
      .withColumn("session_seq",
        sum(col("new_s")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(epoch).as("start_epoch"),
        max(epoch).as("end_epoch"),
        round(sum(col("value")), 4).as("sum_value"))
  }

  /** JSON property extraction + aggregate (gap-list operator — the
    * reference had no JSON/map functions): pull `props.k` out of the
    * JSON column and aggregate per event type. `get_json_object` is a
    * codegen'd built-in; at scale a repeatedly-queried key would be
    * materialized to its own column at ingest.
    */
  def jsonPropAgg(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("kv"))
      .groupBy("event_type")
      .agg(count(col("kv")).as("cnt"),
        round(avg(col("kv")), 6).as("avg_k"),
        min(col("kv")).as("min_k"),
        max(col("kv")).as("max_k"))

  /** Tumbling 1-hour windows per event type (batch twin of the
    * streaming windowed aggregation).
    */
  def hourlyAgg(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(
        unix_timestamp(date_trunc("hour", col("ts"))).as("hour_epoch"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 4).as("sum_value"))
}
