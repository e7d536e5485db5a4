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

  /** Write an edge frame as adjacency-list text via the DSv2 sink:
    * clusters on src (repartition + in-partition sort) so every node's
    * full neighbor list is one line of one part file — the layout the
    * reference's graph jobs consumed (S3/S8). Overwrites prior part
    * files.
    */
  def writeAdjacency(edges: DataFrame, path: String): Unit = {
    import org.apache.spark.sql.functions.col
    edges
      .select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .repartition(col("src"))
      .sortWithinPartitions("src", "dst")
      .write.format("graft-adjacency").mode("overwrite").save(path)
  }
}
