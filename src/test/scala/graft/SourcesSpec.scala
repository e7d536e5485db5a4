package graft

import java.nio.file.Files
import org.apache.spark.sql.types._
import graft.sources.Sources
import graft.operators.{Ml, Relational}

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("readTbl parses '|'-separated positional rows with a named schema") {
    val dir = Files.createTempDirectory("tbl")
    val f = dir.resolve("nation.tbl")
    Files.writeString(f, "0|ALGERIA|0|\n1|ARGENTINA|1|\n")
    val schema = StructType(Seq(
      StructField("n_nationkey", IntegerType),
      StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType)))
    val got = Sources.readTbl(spark, f.toString, schema).collect()
    assert(got.map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSet ==
      Set((0, "ALGERIA", 0), (1, "ARGENTINA", 1)))
  }

  test("readLines assigns stable unique line ids") {
    val dir = Files.createTempDirectory("txt")
    val f = dir.resolve("lines.txt")
    Files.writeString(f, "alpha\nbeta\ngamma\n")
    val got = Sources.readLines(spark, f.toString).collect()
    assert(got.length == 3)
    assert(got.map(_.getLong(0)).distinct.length == 3)
    assert(got.map(_.getString(1)).toSet == Set("alpha", "beta", "gamma"))
  }

  test("semi + anti join partition the customer set") {
    val semi = Relational.semiJoin(spark, sf, "1996-01-01").count()
    val anti = Relational.antiJoin(spark, sf, "1996-01-01").count()
    val all = spark.read.parquet(s"$sf/customer.parquet").count()
    assert(semi + anti == all && semi > 0)
  }

  test("bucketed tables join with zero shuffle exchanges (the 100 TB co-location story)") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("buck").toString
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a non-broadcast join so exchange elimination is what's tested
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.read.parquet(s"$sf/orders.parquet")
        .select("o_orderkey", "o_custkey")
        .write.option("path", s"$dir/ob").mode("overwrite")
        .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("orders_bucketed")
      spark.read.parquet(s"$sf/lineitem.parquet")
        .select("l_orderkey", "l_quantity")
        .write.option("path", s"$dir/lb").mode("overwrite")
        .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("lineitem_bucketed")
      val joined = spark.table("orders_bucketed")
        .join(spark.table("lineitem_bucketed"),
          col("o_orderkey") === col("l_orderkey"))
      val rows = joined.count()
      val want = spark.read.parquet(s"$sf/orders.parquet")
        .join(spark.read.parquet(s"$sf/lineitem.parquet"),
          col("o_orderkey") === col("l_orderkey")).count()
      assert(rows == want && rows > 0)
      val plan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val exchanges = plan.collect { case e: ShuffleExchangeExec => e }
      assert(exchanges.isEmpty,
        s"bucketed join should be exchange-free, found: $exchanges")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.sql("DROP TABLE IF EXISTS orders_bucketed")
      spark.sql("DROP TABLE IF EXISTS lineitem_bucketed")
    }
  }

  test("partitioned write prunes to the matching directory at read") {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("part").toString
    val src = Tables.events(spark, sf) // nanos-ts-safe reader
    src.write.partitionBy("event_type").mode("overwrite").parquet(dir)
    val one = spark.read.parquet(dir).filter(col("event_type") === "click")
    assert(one.count() == src.filter(col("event_type") === "click").count())
    // partition pruning: the scan selects only the click directory
    import org.apache.spark.sql.execution.FileSourceScanExec
    val scan = one.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }.head
    assert(scan.partitionFilters.nonEmpty, "filter should hit partition level")
    // 5 event types, 1 file each: the pruned scan reads exactly 1 file
    assert(scan.selectedPartitions.totalNumberOfFiles == 1,
      s"want 1 file, scanned ${scan.selectedPartitions.totalNumberOfFiles}")
  }

  test("auc: perfect separation gives 1.0, reversed gives 0.0, ties 0.5") {
    val perfect = Seq((0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)).toDF("s", "y")
    val reversed = Seq((0.1, 1), (0.2, 1), (0.8, 0), (0.9, 0)).toDF("s", "y")
    val allTied = Seq((0.5, 1), (0.5, 1), (0.5, 0)).toDF("s", "y")
    def v(df: org.apache.spark.sql.DataFrame): Double =
      Ml.auc(df, "s", "y").collect()(0).getDouble(0)
    assert(v(perfect) == 1.0)
    assert(v(reversed) == 0.0)
    assert(v(allTied) == 0.5)
  }
}
