package graft

import org.apache.spark.sql.functions._
import graft.expressions.HashExpressions

class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("injected SQL functions match their Column-API expressions") {
    val df = Seq(
      (1L, Seq("hash", "join", "scan")),
      (2L, Seq("hash", "join", "scans"))).toDF("id", "ts")
    df.createOrReplaceTempView("ext_t")

    val viaSql = spark.sql(
      """SELECT id, simhash40(ts) AS s40, simhash64(ts) AS s64,
                poly_hash_array(ts) AS ph, minhash_signature(ts, 8) AS mh
         FROM ext_t""").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getSeq[Long](3), r.getSeq[Long](4))).toSet
    val viaCol = df.select(col("id"),
      HashExpressions.simhash40(col("ts")).as("s40"),
      HashExpressions.simhash64(col("ts")).as("s64"),
      HashExpressions.polyHashArray(col("ts")).as("ph"),
      HashExpressions.minhashSignature(col("ts"), 8).as("mh"))
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getSeq[Long](3), r.getSeq[Long](4))).toSet
    assert(viaSql == viaCol)
  }

  test("cosine_sim and no_pushdown work from SQL") {
    val sim = spark.sql(
      "SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS s")
      .collect()(0).getDouble(0)
    assert(math.abs(sim - 1.0) < 1e-12)
    val n = spark.sql(
      "SELECT count(*) AS c FROM (SELECT * FROM range(10) WHERE no_pushdown(id > 4))")
      .collect()(0).getLong(0)
    assert(n == 5)
  }
}
