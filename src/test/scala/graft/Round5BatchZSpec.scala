package graft

import java.sql.{Date, Timestamp}
import graft.operators.{Events, Relational}

/** Round-5 batch Z: KPSS, Engle–Granger, Friedman, Anderson–Darling,
  * delta-method ratio CI, Granger causality. Each test replays the
  * operator's exact integer-grid arithmetic in-process (BigInt for
  * the exact chains, same-order doubles for the final folds) and
  * asserts bit-equality, so the specs pin the algebra while the
  * driver's DuckDB gate pins the cross-engine SQL.
  */
class Round5BatchZSpec extends SparkSpec {
  import spark.implicits._

  private def day(d: Int) = new Timestamp(1704067200000L + d * 86400000L)
  private def q(x: Double, d: Int) = {
    val g = math.pow(10, d)
    math.floor(x * g + 0.5) / g
  }

  /** Write an events fixture with the given per-day counts per type. */
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

  private def kpssReplica(ys: Seq[Long], l: Int = 5): (Double, Long) = {
    val n = ys.length
    val sy = ys.sum
    val e = ys.map(y => y * n - sy)
    val sp = e.scanLeft(0L)(_ + _).tail
    val ssq = sp.map(s => BigInt(s) * s).sum
    val g = (0 to l).map(j =>
      (j until n).map(t => BigInt(e(t)) * e(t - j)).sum)
    val lrn = g(0) * (l + 1) +
      (1 to l).map(j => g(j) * 2 * (l + 1 - j)).sum
    val eta = if (lrn > 0)
      q(ssq.toDouble * (l + 1) / (n.toDouble * lrn.toDouble), 6)
    else 0.0
    (eta, if (eta > 0.463) 1L else 0L)
  }

  test("kpssTest: constant series is exactly stationary (eta = 0)") {
    val dir = java.nio.file.Files.createTempDirectory("kp0").toString
    writeCounts(dir, Map("view" -> Seq(3L, 3L, 3L, 3L, 3L, 3L, 3L, 3L)))
    val r = Events.kpssTest(spark, dir).collect().head
    assert(r.getLong(0) == 8L && r.getDouble(1) == 0.0 &&
      r.getLong(2) == 0L, s"kpss const: $r")
  }

  test("kpssTest: matches the exact-integer replica on a mixed series") {
    val ys = Seq(5L, 1L, 4L, 2L, 6L, 3L, 7L, 2L, 9L, 1L)
    val dir = java.nio.file.Files.createTempDirectory("kp1").toString
    writeCounts(dir, Map("view" -> ys))
    val (eta, flag) = kpssReplica(ys)
    val r = Events.kpssTest(spark, dir).collect().head
    assert(r.getLong(0) == ys.length.toLong, s"n: $r")
    assert(r.getDouble(1) == eta && r.getLong(2) == flag,
      s"kpss: got $r want ($eta, $flag)")
  }

  private def egReplica(xs: Seq[Long], ys: Seq[Long])
      : (Double, Double, Double, Long) = {
    val n = xs.length
    val (sx, sy) = (xs.sum, ys.sum)
    val sxx = xs.map(x => x * x).sum
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    val bnum = n * sxy - sx * sy
    val bden = n * sxx - sx * sx
    val rr = xs.zip(ys).map { case (x, y) =>
      BigInt(bden) * (y * n - sy) - BigInt(bnum) * (x * n - sx) }
    val rl = rr.dropRight(1)
    val dr = rr.tail.zip(rl).map { case (a, b) => a - b }
    val m = rl.length
    val srd = rl.zip(dr).map { case (a, b) => a * b }.sum
    val srr = rl.map(a => a * a).sum
    val sdd = dr.map(a => a * a).sum
    if (bden == 0) return (0.0, 0.0, 0.0, 0L)
    val beta = q(bnum.toDouble / bden.toDouble, 6)
    if (srr == 0) return (beta, 0.0, 0.0, 0L)
    val gam = srd.toDouble / srr.toDouble
    val sse = sdd.toDouble - gam * srd.toDouble
    val t = gam / math.sqrt(sse / (m.toDouble - 1) / srr.toDouble)
    (beta, q(gam, 6), q(t, 4), if (q(t, 4) < -3.37) 1L else 0L)
  }

  test("engleGranger: perfect fit surfaces beta, gates the DF stage") {
    val xs = Seq(3L, 1L, 4L, 1L, 5L, 9L, 2L, 6L)
    val dir = java.nio.file.Files.createTempDirectory("eg0").toString
    writeCounts(dir, Map("view" -> xs, "click" -> xs.map(_ * 2)))
    val r = Events.engleGranger(spark, dir).collect().head
    assert(r.getDouble(1) == 2.0, s"beta: $r")
    assert(r.getDouble(2) == 0.0 && r.getDouble(3) == 0.0 &&
      r.getLong(4) == 0L, s"gated DF: $r")
  }

  test("engleGranger: matches the replica on a noisy cointegrated pair") {
    val xs = Seq(3L, 1L, 4L, 1L, 5L, 9L, 2L, 6L, 5L, 3L)
    val ys = xs.zipWithIndex.map { case (x, i) =>
      2 * x + (if (i % 2 == 0) 1L else 0L) }
    val dir = java.nio.file.Files.createTempDirectory("eg1").toString
    writeCounts(dir, Map("view" -> xs, "click" -> ys))
    val (beta, gam, t, flag) = egReplica(xs, ys)
    val r = Events.engleGranger(spark, dir).collect().head
    assert(r.getLong(0) == xs.length.toLong, s"n: $r")
    assert(r.getDouble(1) == beta && r.getDouble(2) == gam &&
      r.getDouble(3) == t && r.getLong(4) == flag,
      s"eg: got $r want ($beta, $gam, $t, $flag)")
  }

  test("friedmanTest: consistent ranking across b blocks gives Q = 2b") {
    val dir = java.nio.file.Files.createTempDirectory("fr").toString
    val rows = for {
      m <- Seq("01", "02", "03", "04")
      (f, p) <- Seq(("A", 10.0), ("N", 20.0), ("R", 30.0))
    } yield (Date.valueOf(s"2024-$m-15"), f, p)
    rows.toDF("l_shipdate", "l_returnflag", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = Relational.friedmanTest(spark, dir).collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 3L, s"bk: $r")
    assert(r.getDouble(2) == 8.0 && r.getLong(3) == 1L, s"q: $r")
  }

  test("friedmanTest: all-tied blocks give Q = 0 via midranks") {
    val dir = java.nio.file.Files.createTempDirectory("ft").toString
    val rows = for {
      m <- Seq("01", "02", "03")
      f <- Seq("A", "N", "R")
    } yield (Date.valueOf(s"2024-$m-15"), f, 42.0)
    rows.toDF("l_shipdate", "l_returnflag", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = Relational.friedmanTest(spark, dir).collect().head
    assert(r.getDouble(2) == 0.0 && r.getLong(3) == 0L, s"tied: $r")
  }

  private def adReplica(counts: Map[Long, Long]): Double = {
    val n = counts.values.sum
    val sorted = counts.toSeq.sortBy(_._1)
    var s = 0L
    var s9 = BigInt(0)
    for ((v, c) <- sorted) {
      val u = (v.toDouble - 0.5) / 50.0
      val lnu9 = math.floor(math.log(u) * 1e9 + 0.5).toLong
      val ln1u9 = math.floor(math.log(1.0 - u) * 1e9 + 0.5).toLong
      s9 += BigInt(2 * s * c + c * c) * lnu9 +
        BigInt(2 * c * (n - s) - c * c) * ln1u9
      s += c
    }
    q(-n.toDouble - s9.toDouble / (n.toDouble * 1e9), 6)
  }

  test("andersonDarling: exact-uniform counts match the replica, accept") {
    val dir = java.nio.file.Files.createTempDirectory("ad").toString
    (1L to 50L).map(v => Tuple1(v.toDouble))
      .toDF("l_quantity")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val a2 = adReplica((1L to 50L).map(_ -> 1L).toMap)
    val r = Relational.andersonDarling(spark, dir).collect().head
    assert(r.getLong(0) == 50L && r.getDouble(1) == a2 &&
      r.getLong(2) == 0L, s"ad: got $r want $a2")
  }

  test("andersonDarling: a spiked tail rejects") {
    val dir = java.nio.file.Files.createTempDirectory("ad2").toString
    ((1L to 50L) ++ Seq.fill(200)(50L)).map(v => Tuple1(v.toDouble))
      .toDF("l_quantity")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val counts = ((1L to 49L).map(_ -> 1L) :+ (50L -> 201L)).toMap
    val a2 = adReplica(counts)
    val r = Relational.andersonDarling(spark, dir).collect().head
    assert(r.getDouble(1) == a2 && r.getLong(2) == 1L, s"spike: $r")
  }

  test("deltaMethodRatio: identical users per arm give se = 0") {
    val dir = java.nio.file.Files.createTempDirectory("dm").toString
    // arm 0: users 2, 4 each (x=300 cents, y=2); arm 1: users 1, 3
    // each (x=600 cents, y=2) → ratios 1.5 and 3.0, zero variance
    val rows = Seq(
      (1L, day(0), 2L, "view", 1.0), (2L, day(0), 2L, "view", 2.0),
      (3L, day(0), 4L, "view", 1.0), (4L, day(0), 4L, "view", 2.0),
      (5L, day(0), 1L, "view", 2.0), (6L, day(0), 1L, "view", 4.0),
      (7L, day(0), 3L, "view", 2.0), (8L, day(0), 3L, "view", 4.0))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Events.deltaMethodRatio(spark, dir).collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L, s"n: $r")
    assert(r.getDouble(2) == 1.5 && r.getDouble(3) == 3.0, s"ratio: $r")
    assert(r.getDouble(4) == 0.0 && r.getDouble(5) == 0.0, s"se: $r")
  }

  test("deltaMethodRatio: matches the same-order double replica") {
    val dir = java.nio.file.Files.createTempDirectory("dm2").toString
    val rows = Seq(
      (1L, day(0), 2L, "view", 1.0), (2L, day(0), 2L, "view", 2.5),
      (3L, day(0), 4L, "view", 4.0),
      (4L, day(0), 6L, "view", 2.0), (5L, day(0), 6L, "view", 1.0),
      (6L, day(0), 1L, "view", 3.0), (7L, day(0), 1L, "view", 0.5),
      (8L, day(0), 3L, "view", 6.0), (9L, day(0), 5L, "view", 2.0))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    def arm(users: Seq[(Long, Long)]): (Double, Double) = {
      val n = users.length.toDouble
      val sx = users.map(_._1).sum.toDouble
      val sy = users.map(_._2).sum.toDouble
      val sxx = users.map(u => u._1 * u._1).sum.toDouble
      val sxy = users.map(u => u._1 * u._2).sum.toDouble
      val syy = users.map(u => u._2 * u._2).sum.toDouble
      val r = sx / sy
      val vx = (n * sxx - sx * sx) / (n * n)
      val cxy = (n * sxy - sx * sy) / (n * n)
      val vy = (n * syy - sy * sy) / (n * n)
      val muY = sy / n
      val se = math.sqrt(math.max(0.0,
        (vx - 2.0 * r * cxy + r * r * vy) / (n * muY * muY)))
      (r / 100.0, se / 100.0)
    }
    // per-user (cents, events): arm0 u2=(350,2) u4=(400,1) u6=(300,2)
    // arm1 u1=(350,2) u3=(600,1) u5=(200,1)
    val (r0, e0) = arm(Seq((350L, 2L), (400L, 1L), (300L, 2L)))
    val (r1, e1) = arm(Seq((350L, 2L), (600L, 1L), (200L, 1L)))
    val z = q((r1 - r0) / math.sqrt(e0 * e0 + e1 * e1), 4)
    val r = Events.deltaMethodRatio(spark, dir).collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L, s"n: $r")
    assert(r.getDouble(2) == q(r0, 6) && r.getDouble(3) == q(r1, 6),
      s"ratios: $r want (${q(r0, 6)}, ${q(r1, 6)})")
    assert(r.getDouble(4) == q(e0, 6) && r.getDouble(5) == q(e1, 6),
      s"ses: $r want (${q(e0, 6)}, ${q(e1, 6)})")
    assert(r.getDouble(6) == z, s"z: $r want $z")
  }

  private def grangerReplica(vs: Seq[Long], ps: Seq[Long])
      : (Double, Double, Double, Long) = {
    val yt = ps.tail
    val yl = ps.dropRight(1)
    val xl = vs.dropRight(1)
    val n = yt.length
    def s(a: Seq[Long]) = a.sum
    def sp(a: Seq[Long], b: Seq[Long]) =
      a.zip(b).map { case (u, w) => u * w }.sum
    val (st, sl, sx) = (s(yt), s(yl), s(xl))
    val (stt, stl, stx) = (sp(yt, yt), sp(yt, yl), sp(yt, xl))
    val (sll, slx, sxx) = (sp(yl, yl), sp(yl, xl), sp(xl, xl))
    def b(x: Long) = BigInt(x)
    val det = b(n) * (b(sll) * sxx - b(slx) * slx) -
      b(sl) * (b(sl) * sxx - b(slx) * sx) +
      b(sx) * (b(sl) * slx - b(sll) * sx)
    val detA = b(st) * (b(sll) * sxx - b(slx) * slx) -
      b(sl) * (b(stl) * sxx - b(slx) * stx) +
      b(sx) * (b(stl) * slx - b(sll) * stx)
    val detB = b(n) * (b(stl) * sxx - b(stx) * slx) -
      b(st) * (b(sl) * sxx - b(slx) * sx) +
      b(sx) * (b(sl) * stx - b(stl) * sx)
    val detC = b(n) * (b(sll) * stx - b(slx) * stl) -
      b(sl) * (b(sl) * stx - b(stl) * sx) +
      b(st) * (b(sl) * slx - b(sll) * sx)
    val sseuNum = det * stt - (detA * st + detB * stl + detC * stx)
    val ncyy = b(n) * stt - b(st) * st
    val ncyl = b(n) * stl - b(st) * sl
    val ncll = b(n) * sll - b(sl) * sl
    if (det == 0 || ncll == 0 || sseuNum == 0) return (0.0, 0.0, 0.0, 0L)
    val sseu = sseuNum.toDouble / det.toDouble
    val sser = (ncyy.toDouble -
      ncyl.toDouble * ncyl.toDouble / ncll.toDouble) / n.toDouble
    val f = (sser - sseu) * (n.toDouble - 3) / sseu
    (q(detB.toDouble / det.toDouble, 6),
      q(detC.toDouble / det.toDouble, 6), q(f, 4),
      if (q(f, 4) > 3.84) 1L else 0L)
  }

  test("grangerCausality: lagged driver matches the replica and flags") {
    val vs = Seq(3L, 9L, 1L, 8L, 2L, 7L, 4L, 6L, 5L, 9L)
    val ps = 2L +: vs.dropRight(1).zipWithIndex.map { case (v, i) =>
      v + (i % 2) }
    val dir = java.nio.file.Files.createTempDirectory("gc").toString
    writeCounts(dir, Map("view" -> vs, "purchase" -> ps))
    val (bY, cX, f, flag) = grangerReplica(vs, ps)
    val r = Events.grangerCausality(spark, dir).collect().head
    assert(r.getLong(0) == vs.length.toLong - 1, s"n: $r")
    assert(r.getDouble(1) == bY && r.getDouble(2) == cX,
      s"coefs: got $r want ($bY, $cX)")
    assert(r.getDouble(3) == f && r.getLong(4) == flag,
      s"f: got $r want ($f, $flag)")
    assert(flag == 1L, "the lagged driver should be detected")
  }

  test("grangerCausality: constant target gates to zeros") {
    val vs = Seq(3L, 9L, 1L, 8L, 2L, 7L)
    val dir = java.nio.file.Files.createTempDirectory("gc0").toString
    writeCounts(dir, Map("view" -> vs,
      "purchase" -> Seq.fill(vs.length)(4L)))
    val r = Events.grangerCausality(spark, dir).collect().head
    assert(r.getDouble(1) == 0.0 && r.getDouble(2) == 0.0 &&
      r.getDouble(3) == 0.0 && r.getLong(4) == 0L, s"gated: $r")
  }
}
