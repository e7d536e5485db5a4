package graft

import java.sql.{Date, Timestamp}
import graft.operators.{Dedup, Events, Graph, Relational}

/** Round-5 batch AB: Chow break test, Wilcoxon signed-rank,
  * Count-Sketch audit, capture–recapture dedup estimate, Moran's I,
  * Page trend test.
  */
class Round5BatchABSpec extends SparkSpec {
  import spark.implicits._

  private def day(d: Int) = new Timestamp(1704067200000L + d * 86400000L)
  private def q(x: Double, d: Int) = {
    val g = math.pow(10, d)
    math.floor(x * g + 0.5) / g
  }

  private def writeCounts(dir: String,
                          counts: Map[String, Seq[Long]]): Unit = {
    var id = 0L
    val rows = counts.toSeq.flatMap { case (et, perDay) =>
      perDay.zipWithIndex.flatMap { case (c, d) =>
        (0L until c).map { j =>
          id += 1
          (id, day(d), (id % 7) + 1, et, 1.0 + (j % 3))
        }
      }
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  test("chowTest: one straight line — F gates at 0") {
    val dir = java.nio.file.Files.createTempDirectory("ch0").toString
    writeCounts(dir, Map("view" -> (1L to 10L)))
    val r = Events.chowTest(spark, dir).collect().head
    // perfect linear fit in both halves and pooled → sse12 = 0 → gated
    assert(r.getLong(0) == 10L && r.getDouble(1) == 0.0 &&
      r.getLong(2) == 0L, s"line: $r")
  }

  test("chowTest: a mid-series slope flip breaks hard") {
    val dir = java.nio.file.Files.createTempDirectory("ch1").toString
    // rise 1..5 then fall 5..1, with unit noise so SSEs are nonzero
    val ys = Seq(1L, 3L, 2L, 4L, 5L, 5L, 4L, 2L, 3L, 1L)
    writeCounts(dir, Map("view" -> ys))
    def sse(pts: Seq[(Long, Long)]): Double = {
      val n = pts.length.toDouble
      val st = pts.map(_._1).sum.toDouble
      val sy = pts.map(_._2).sum.toDouble
      val stt = pts.map(p => p._1 * p._1).sum.toDouble
      val sty = pts.map(p => p._1 * p._2).sum.toDouble
      val syy = pts.map(p => p._2 * p._2).sum.toDouble
      val sxxc = n * stt - st * st
      val sxyc = n * sty - st * sy
      val syyc = n * syy - sy * sy
      (syyc - sxyc * sxyc / (if (sxxc == 0.0) 1.0 else sxxc)) / n
    }
    val pts = ys.zipWithIndex.map { case (y, t) => (t.toLong, y) }
    val (h1, h2) = pts.splitAt(5)
    val sse12 = sse(h1) + sse(h2)
    val f = (sse(pts) - sse12) / 2.0 / (sse12 / (10.0 - 4))
    val r = Events.chowTest(spark, dir).collect().head
    assert(r.getDouble(1) == q(f, 4), s"f: got $r want ${q(f, 4)}")
    assert(r.getLong(2) == (if (q(f, 4) > 3.0) 1L else 0L), s"flag: $r")
  }

  test("wilcoxonSignedRank: symmetric differences give z = 0") {
    val dir = java.nio.file.Files.createTempDirectory("wx0").toString
    // view−click per day: +2, −2, +1, −1 → W⁺ shares half the ranks
    writeCounts(dir, Map(
      "view" -> Seq(5L, 3L, 4L, 3L), "click" -> Seq(3L, 5L, 3L, 4L)))
    val r = Events.wilcoxonSignedRank(spark, dir).collect().head
    assert(r.getLong(0) == 4L, s"n: $r")
    // |d| = 2,2,1,1 → midranks 1.5,1.5,3.5,3.5 (half-units 3,3,7,7);
    // positive half carries 3+7=10 = n(n+1)/2 → z = 0
    assert(r.getLong(1) == 10L && r.getDouble(2) == 0.0 &&
      r.getLong(3) == 0L, s"sym: $r")
  }

  test("wilcoxonSignedRank: one-sided shift flags") {
    val dir = java.nio.file.Files.createTempDirectory("wx1").toString
    val views = (1 to 12).map(d => 10L + d).toSeq
    writeCounts(dir, Map("view" -> views,
      "click" -> Seq.fill(12)(5L)))
    // every diff positive and distinct → W⁺₂ = Σ(2i+0) = n(n+1),
    // z = 2(n(n+1) − n(n+1)/2)/√Σ(2i)² = n(n+1)/√(4Σi²)
    val n = 12.0
    val s22 = (1 to 12).map(i => (2L * i) * (2L * i)).sum
    val z = q(2.0 * (n * (n + 1) - n * (n + 1) / 2) / math.sqrt(s22.toDouble), 6)
    val r = Events.wilcoxonSignedRank(spark, dir).collect().head
    assert(r.getLong(1) == 156L && r.getDouble(2) == z &&
      r.getLong(3) == 1L, s"shift: got $r want z=$z")
  }

  test("countSketchAudit: singleton corpus estimates exactly") {
    val dir = java.nio.file.Files.createTempDirectory("cs").toString
    // one distinct token → no collisions → every row reads sign²·c
    Seq((1L, "alpha alpha alpha", "en", "s", 17L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = graft.operators.TextStats.countSketchAudit(spark, dir)
      .collect()
    assert(r.length == 1, s"rows: ${r.length}")
    assert(r.head.getLong(1) == 3L && r.head.getLong(2) == 3L &&
      r.head.getLong(3) == 0L, s"exact: ${r.head}")
  }

  test("captureRecapture: Chapman on the fixture detector pair sets") {
    val dir = java.nio.file.Files.createTempDirectory("cr").toString
    val rep = "alpha beta gamma delta epsilon zeta eta theta"
    Seq((1L, rep, "s"), (2L, rep, "s"),
      (3L, "totally different words here now", "s"))
      .map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // both detectors find exactly the (1,2) pair → n1=n2=m=1,
    // chapman = 4/2 − 1 = 1.0, union 1, missed 0
    val r = Dedup.captureRecapture(spark, dir).collect().head
    assert(r.getLong(0) == 1L && r.getLong(1) == 1L &&
      r.getLong(2) == 1L && r.getLong(3) == 1L, s"counts: $r")
    assert(r.getDouble(4) == 1.0 && r.getDouble(5) == 0.0, s"chap: $r")
  }

  test("moranI: assorted attribute clusters on the co-purchase graph") {
    val dir = java.nio.file.Files.createTempDirectory("mi").toString
    // rich pair {s1,s2} co-occurs 3× (orders 1,3,5); poor pair
    // {s3,s4} once — the top-decile multiplicity cut keeps (1,2) only
    val li = Seq((1L, 1L, 1.5), (1L, 2L, 1.5), (2L, 3L, 0.5),
      (2L, 4L, 0.5), (3L, 1L, 1.5), (3L, 2L, 1.5),
      (5L, 1L, 1.5), (5L, 2L, 1.5))
    li.toDF("l_orderkey", "l_suppkey", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    // x = (450,450,50,50) cents, S=1000, n=4 → z' = (800,800,-800,-800)
    // kept pair (1,2): num = 800², W = 2, den = 4·800²
    // I = 4·(2·800²)/(2·4·800²) = 1.0
    val r = Graph.moranI(spark, dir).collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 2L, s"nw: $r")
    assert(r.getDouble(2) == 1.0, s"I: $r")
    assert(r.getDouble(3) == q(-1.0 / 3, 6) && r.getLong(4) == 1L,
      s"ei: $r")
  }

  test("pageTrend: a stable monthly ordering maxes L") {
    val dir = java.nio.file.Files.createTempDirectory("pg").toString
    val rows = for {
      m <- Seq("01", "02", "03", "04", "05", "06")
      (f, p) <- Seq(("A", 10.0), ("N", 20.0), ("R", 30.0))
    } yield (Date.valueOf(s"2024-$m-15"), f, p)
    rows.toDF("l_shipdate", "l_returnflag", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    // ranks always (A,N,R)=(1,2,3) → L = b·(1+4+9) = 6·14 = 84
    // L2 = 168; mean2 = 6·3·16/2 = 144; vr = 6·9·4·8/36 = 48
    val z = q((168.0 - 144.0) / math.sqrt(48.0), 6)
    val r = Relational.pageTrend(spark, dir).collect().head
    assert(r.getLong(0) == 6L && r.getLong(1) == 3L, s"bk: $r")
    assert(r.getLong(2) == 168L && r.getDouble(3) == z, s"l2: $r")
    assert(r.getLong(4) == (if (z > 1.644854) 1L else 0L), s"flag: $r")
  }
}
