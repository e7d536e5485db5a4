package graft

import java.sql.Timestamp
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.operators.{Events, Relational}

/** Property checks for the round-3 algorithmic additions: the native
  * as-of join must agree with the composed union+carry operator on
  * random event logs, and the two-phase skyline must agree with the
  * brute-force dominance definition on random point sets. Case counts
  * kept low: each case runs real Spark jobs.
  */
class Round3PropertySpec extends SparkSpec {
  import spark.implicits._

  private val eventsGen: Gen[List[(Long, Long, Long, String, Double)]] =
    for {
      n <- Gen.choose(5, 40)
      rows <- Gen.listOfN(n, for {
        user <- Gen.choose(1L, 4L)
        sec <- Gen.choose(0L, 30L) // tight range forces timestamp ties
        ty <- Gen.oneOf("view", "purchase", "click")
        v <- Gen.choose(0, 100).map(_.toDouble)
      } yield (user, sec, ty, v))
    } yield rows.zipWithIndex.map { case ((u, sec, ty, v), i) =>
      (i.toLong, sec, u, ty, v)
    }

  test("random logs: native as-of join == composed union+carry") {
    val prop = Prop.forAllNoShrink(eventsGen) { rows =>
      val dir = java.nio.file.Files.createTempDirectory("asofp").toString
      rows.map { case (id, sec, u, ty, v) =>
        (id, new Timestamp(1700000000000L + sec * 1000L), u, ty, v)
      }.toDF("event_id", "ts", "user_id", "event_type", "value")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val native = Events.asofJoinNative(spark, dir, "purchase", "view")
        .collect().map(_.toSeq).toSet
      val composed = Events.asofJoin(spark, dir, "purchase", "view")
        .collect().map(_.toSeq).toSet
      if (native != composed)
        println(s"COUNTEREXAMPLE rows=$rows\n native=$native\n comp=$composed")
      native == composed
    }
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(6)
      .withInitialSeed(org.scalacheck.rng.Seed(7L))
    val res = SCTest.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  private val intervalsGen: Gen[List[(Long, Long, Long, Double)]] = for {
    n <- Gen.choose(3, 25)
    rows <- Gen.listOfN(n, for {
      user <- Gen.choose(1L, 3L)
      start <- Gen.choose(0L, 50L)
      dur <- Gen.choose(1, 20).map(_.toDouble)
    } yield (user, start, dur))
  } yield rows.zipWithIndex.map { case ((u, st, d), i) =>
    (i.toLong, st, u, d)
  }

  test("random intervals: union coverage == brute-force merge") {
    val prop = Prop.forAllNoShrink(intervalsGen) { rows =>
      val dir = java.nio.file.Files.createTempDirectory("ivp").toString
      rows.map { case (id, st, u, d) =>
        (id, new Timestamp(1700000000000L + st * 1000L), u, d)
      }.toDF("event_id", "ts", "user_id", "value")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val got = Events.intervalUnion(spark, dir).collect()
        .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
      // brute-force merge per user over double timestamps
      val want = rows.groupBy(_._3).map { case (u, rs) =>
        val ivs = rs.map { case (_, st, _, d) =>
          (st.toDouble, st.toDouble + d)
        }.sortBy(iv => (iv._1, iv._2))
        val merged = ivs.foldLeft(List.empty[(Double, Double)]) {
          case (acc, (a, b)) => acc match {
            case (x, y) :: t if a <= y => (x, math.max(y, b)) :: t
            case _ => (a, b) :: acc
          }
        }
        u -> (merged.length.toLong,
          BigDecimal(merged.map(iv => iv._2 - iv._1).sum)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      if (got != want) println(s"COUNTEREXAMPLE rows=$rows got=$got want=$want")
      got == want
    }
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(8)
      .withInitialSeed(org.scalacheck.rng.Seed(23L))
    val res = SCTest.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  private val pointsGen: Gen[List[(Long, Double, Long)]] = for {
    n <- Gen.choose(3, 30)
    pts <- Gen.listOfN(n, for {
      p <- Gen.choose(1, 8).map(_.toDouble) // small domains force ties
      d <- Gen.choose(1L, 8L)
    } yield (p, d))
  } yield pts.zipWithIndex.map { case ((p, d), i) => (i.toLong, p, d) }

  test("random points: two-phase skyline == brute-force dominance") {
    val prop = Prop.forAllNoShrink(pointsGen) { pts =>
      val dir = java.nio.file.Files.createTempDirectory("skyp").toString
      pts.map { case (k, p, d) =>
        (k, p, new Timestamp(d * 86400000L))
      }.toDF("o_orderkey", "o_totalprice", "o_orderdate")
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
      val got = Relational.skyline(spark, dir).collect()
        .map(_.getLong(0)).toSet
      val want = pts.filter { case (_, p, d) =>
        !pts.exists { case (_, p2, d2) =>
          p2 >= p && d2 <= d && (p2 > p || d2 < d)
        }
      }.map(_._1).toSet
      if (got != want)
        println(s"COUNTEREXAMPLE pts=$pts got=$got want=$want")
      got == want
    }
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(8)
      .withInitialSeed(org.scalacheck.rng.Seed(11L))
    val res = SCTest.check(params, prop)
    assert(res.passed, res.status.toString)
  }
}
