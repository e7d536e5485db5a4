package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Semi-structured ingestion via Spark 4's VARIANT type (W517): the
  * open-schema JSON path a real ingest pipeline takes before its
  * schemas stabilize. Each event serializes to a JSON document, parses
  * back to a VARIANT (`parse_json` — binary-encoded, no corpus-wide
  * schema-inference pass), and typed values are recovered with
  * `variant_get` plus `try_variant_get` probing a path that does not
  * exist (the open-schema miss case must yield NULL, not an error).
  * The gate pins the full roundtrip: per-type counts, cent-grid value
  * sums and user-id sums recovered FROM THE VARIANT must equal the
  * same aggregates on the original typed columns — `to_json` prints
  * doubles in shortest-roundtrip form, so the double survives
  * bit-exactly. Scale: one scan + one type-keyed rollup; per-row
  * parse cost is O(|json|), state-free.
  */
object VariantOps {

  def variantRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val js = Tables.events(s, dir)
      .select(to_json(struct(col("user_id"), col("event_type"),
        col("value"))).as("js"))
    val v = js.select(parse_json(col("js")).as("v"))
    val got = v.select(
      variant_get(col("v"), "$.event_type", "string").as("event_type"),
      variant_get(col("v"), "$.user_id", "bigint").as("user_id"),
      variant_get(col("v"), "$.value", "double").as("value"),
      try_variant_get(col("v"), "$.missing", "bigint").as("miss"))
    got.groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 100 + lit(0.5)).cast("long"))
          .as("v_cents"),
        sum(col("user_id")).as("uid_sum"),
        sum(when(col("miss").isNull, 0L).otherwise(1L)).as("n_phantom"))
      .orderBy("event_type")
  }

  /** XML ingestion roundtrip (W518 sibling, W519): Spark 4's built-in
    * XML path (`to_xml` / `from_xml`, the spark-xml lineage merged into
    * core) — each event serializes to an XML `<ROW>` document and
    * parses back through an explicit schema; the per-type aggregates
    * recovered from the XML hop must equal the typed-column
    * aggregates bit-exactly (doubles print shortest-roundtrip, and the
    * event_type vocabulary needs no XML escaping — escaping itself is
    * the parser's concern either way since to_xml writes entities).
    * Scale: one scan + one type-keyed rollup, row-local parse cost.
    */
  def xmlRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val x = Tables.events(s, dir)
      .select(to_xml(struct(col("user_id"), col("event_type"),
        col("value"))).as("x"))
    val back = x.select(from_xml(col("x"),
        lit("STRUCT<user_id: BIGINT, event_type: STRING, value: DOUBLE>"))
        .as("r"))
      .select(col("r.user_id").as("user_id"),
        col("r.event_type").as("event_type"),
        col("r.value").as("value"))
    back.groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 100 + lit(0.5)).cast("long"))
          .as("v_cents"),
        sum(col("user_id")).as("uid_sum"))
      .orderBy("event_type")
  }

  /** CSV ingestion roundtrip (W530): the third serde hop after VARIANT
    * JSON and XML — `to_csv` / `from_csv` with an explicit schema (the
    * flat-file lingua franca every ingest boundary still speaks).
    * Same contract: per-type aggregates recovered from the CSV text
    * must equal the typed-column aggregates bit-exactly (doubles print
    * shortest-roundtrip; event_type has no delimiter/quote characters,
    * and quoting is the parser's concern regardless).
    */
  def csvRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.events(s, dir)
      .select(to_csv(struct(col("user_id"), col("event_type"),
        col("value"))).as("c"))
    val back = c.select(from_csv(col("c"),
        org.apache.spark.sql.types.StructType.fromDDL(
          "user_id BIGINT, event_type STRING, value DOUBLE"),
        Map.empty[String, String]).as("r"))
      .select(col("r.user_id").as("user_id"),
        col("r.event_type").as("event_type"),
        col("r.value").as("value"))
    back.groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 100 + lit(0.5)).cast("long"))
          .as("v_cents"),
        sum(col("user_id")).as("uid_sum"))
      .orderBy("event_type")
  }

  /** ORC sink + scan roundtrip (W531): the engine's columnar-format
    * breadth beyond parquet — events written to ORC (zlib, the
    * default) and read back must aggregate identically; the scan path
    * exercises ORC's own predicate/column machinery (the readback
    * projects 2 of 4 columns, so the ORC reader prunes). Staged in a
    * temp dir, deleted after the readback materializes.
    */
  def orcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    // try/finally: a failed write/read must still reclaim the staging
    // tree, or retries accumulate leaked temp dirs (ADVICE r8)
    val root = java.nio.file.Files
      .createTempDirectory("graft_orc").toString
    try {
      val staged = s"$root/events_orc"
      Tables.events(s, dir)
        .select("event_id", "user_id", "event_type", "value")
        .write.orc(staged)
      s.read.orc(staged)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          sum(floor(col("value") * 100 + lit(0.5)).cast("long"))
            .as("v_cents"))
        .orderBy("event_type")
        .localCheckpoint() // materialize before the staging dir is deleted
    } finally deleteRec(root)
  }

  private def deleteRec(root: String): Unit = {
    import scala.jdk.CollectionConverters._
    val p = java.nio.file.Paths.get(root)
    if (java.nio.file.Files.exists(p)) {
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }
}
