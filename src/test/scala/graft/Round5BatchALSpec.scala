package graft

import graft.operators.Relational

/** Round-5 batch AL: ABC Pareto classification. */
class Round5BatchALSpec extends SparkSpec {
  import spark.implicits._

  test("abcClassification: exact Pareto cuts on a hand ladder") {
    val dir = java.nio.file.Files.createTempDirectory("abc").toString
    // revenues 70, 20, 6, 3, 1 (total 100): part 1 starts at 0% → A;
    // part 2 starts at 70% → A; part 3 starts at 90% → B;
    // part 4 at 96% → C; part 5 at 99% → C
    Seq((1L, 70.0), (2L, 20.0), (3L, 6.0), (4L, 3.0), (5L, 1.0))
      .toDF("l_partkey", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = Relational.abcClassification(spark, dir).collect().head
    assert(r.getLong(0) == 5L, s"n: $r")
    assert(r.getLong(1) == 2L && r.getLong(2) == 1L &&
      r.getLong(3) == 2L, s"classes: $r")
    assert(r.getDouble(4) == 0.9 && r.getDouble(5) == 0.06, s"shares: $r")
  }
}
