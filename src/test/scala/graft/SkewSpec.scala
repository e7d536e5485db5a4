package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted count equals plain groupBy count on a hot-key distribution") {
    // 10k rows of one hot key + a long tail
    val hot = Seq.fill(10000)("hot") ++ (1 to 500).map(i => s"k$i")
    val df = hot.toDF("k")
    val plain = df.groupBy("k").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(df, col("k")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("salted sum equals plain sum") {
    val df = (1 to 5000).map(i => (if (i % 2 == 0) "a" else s"k${i % 7}", i.toDouble))
      .toDF("k", "v")
    val plain = df.groupBy("k").agg(sum("v")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val salted = Skew.saltedSum(df, col("k"), col("v")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(salted.keySet == plain.keySet)
    salted.foreach { case (k, v) =>
      assert(math.abs(v - plain(k)) < 1e-6)
    }
  }

  test("saltedJoin result set equals the plain join (hot key included)") {
    // 'hot' dominates the probe side — the case salting exists for
    val big = ((1 to 2000).map(i => ("hot", i)) ++
      (1 to 200).map(i => (s"k${i % 11}", i))).toDF("bk", "bv")
    val small = Seq(("hot", "H"), ("k1", "A"), ("k2", "B"), ("zzz", "Z"))
      .toDF("sk", "sv")
    val plain = big.join(small, col("bk") === col("sk"))
      .select("bk", "bv", "sv").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2))).sorted.toSeq
    val salted = Skew.saltedJoin(big, small, "bk", "sk", salts = 4)
      .select("bk", "bv", "sv").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2))).sorted.toSeq
    assert(salted == plain && plain.nonEmpty)
  }
}
