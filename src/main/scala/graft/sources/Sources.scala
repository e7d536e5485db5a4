package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Raw-source readers beyond parquet (reference S1/S2: text lines and
  * '|'-separated `.tbl` files, `Q1.scala:39-41`). The engine's canonical
  * storage is parquet; these cover ingest from the reference's formats.
  */
object Sources {

  /** TPC-H `.tbl`: '|'-separated positional fields, no header, one row
    * per line (possibly with a trailing '|'). The explicit schema names
    * and types the columns the reference addressed by ordinal.
    */
  def readTbl(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read
      .schema(schema)
      .option("sep", "|")
      .option("header", "false")
      .csv(path)

  /** Plain text lines with a stable line id (the reference used the
    * input byte offset as an accidental doc id — S1; an explicit
    * monotonic id replaces that).
    */
  def readLines(s: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.functions._
    s.read.text(path)
      .select(monotonically_increasing_id().as("line_id"),
        col("value").as("line"))
  }
}
