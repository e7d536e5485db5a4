package graft

import graft.operators.{Relational, Similarity}

/** Round-6 batch C (W492–W493): the IVF nprobe tuning sweep and the
  * per-brand inventory policy table.
  */
class Round6BatchCSpec extends SparkSpec {
  import spark.implicits._

  test("nprobeRecallSweep: recall non-decreasing, candidates increasing") {
    val rs = Similarity.nprobeRecallSweep(spark, sf).collect()
    assert(rs.length == 4, s"rows: ${rs.mkString(";")}")
    assert(rs.map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L, 8L))
    val recalls = rs.map(_.getDouble(2))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => b >= a },
      s"recall must not fall with nprobe: ${recalls.mkString(",")}")
    val cands = rs.map(_.getLong(1))
    assert(cands.zip(cands.tail).forall { case (a, b) => b > a },
      s"candidate volume must grow: ${cands.mkString(",")}")
    assert(recalls.forall(r => r > 0.0 && r <= 1.0))
  }

  test("lshBandSweep: more bands never loses candidates; near-dup found") {
    val dir = java.nio.file.Files.createTempDirectory("lbs6").toString
    val base = ('a' to 'l').map(c => s"$c$c$c").mkString(" ")
    Seq((1L, base, "sA"), (2L, base + " tail", "sA"),
      (3L, "entirely different words that never overlap at all", "sB"))
      .map { case (id, t, src) =>
        (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rs = graft.operators.Dedup.lshBandSweep(spark, dir).collect()
    CacheScope.release(spark)
    assert(rs.length == 3)
    assert(rs.map(_.getLong(0)).toSeq == Seq(4L, 8L, 16L))
    // docs 1-2 share 10 of 11 shingles (j = 10/11 >= 0.8): one truth
    // pair, found at the single-hash banding with certainty-in-practice
    assert(rs.forall(_.getLong(3) == 1L), s"n_true: ${rs.mkString(";")}")
    assert(rs.last.getDouble(5) == 1.0, s"recall@16: ${rs.last}")
    val cands = rs.map(_.getLong(2))
    assert(cands.zip(cands.tail).forall { case (a, b) => b >= a },
      s"candidates must not fall as bands rise: ${cands.mkString(",")}")
  }

  test("inventoryPolicy: two-day brand — exact EOQ/SS/ROP chain") {
    val dir = java.nio.file.Files.createTempDirectory("inv6").toString
    def d(day: Int) = java.sql.Date.valueOf(f"2024-01-${day + 1}%02d")
    Seq((1L, d(0), 3.0), (1L, d(1), 5.0))
      .toDF("l_partkey", "l_shipdate", "l_quantity")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((1L, "BrandX"))
      .toDF("p_partkey", "p_brand")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val r = Relational.inventoryPolicy(spark, dir).collect().head
    assert(r.getString(0) == "BrandX" && r.getLong(1) == 2L &&
      r.getLong(2) == 8L, s"counts: $r")
    def q4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    val z = 1.6448536269514722
    // n=2, D=8: sigma = sqrt((34 - 64/2)/1) = sqrt(2)
    val sigma = math.sqrt((34.0 - (8.0 * 8.0) / 2.0) / (2.0 - 1.0))
    assert(r.getDouble(3) == q4(math.sqrt((2.0 * 8.0 * 100.0) / 2.0)),
      s"eoq: $r")
    assert(r.getDouble(4) == q4(z * sigma * math.sqrt(7.0)), s"ss: $r")
    assert(r.getDouble(5) ==
      q4(8.0 / 2.0 * 7.0 + z * sigma * math.sqrt(7.0)), s"rop: $r")
  }
}
