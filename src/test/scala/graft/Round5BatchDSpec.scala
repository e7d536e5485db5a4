package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.{Events, Graph, Ml, Relational, TextStats}

/** Round-5 batch D: Shapley attribution, BH-FDR, closed-form ridge,
  * temporal graph churn, G² keyness, LATERAL top-k.
  */
class Round5BatchDSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long) = new Timestamp(1700000000000L + min * 60000L)

  test("shapleyAttribution: unanimity game — touched set splits evenly") {
    val dir = java.nio.file.Files.createTempDirectory("shap").toString
    // one converter touched {click, view} pre-purchase; signup AFTER
    // the purchase must not count; a non-converter's touches ignored
    Seq(
      (0L, ts(0), 1L, "click", 1.0),
      (1L, ts(1), 1L, "view", 1.0),
      (2L, ts(2), 1L, "purchase", 9.0),
      (3L, ts(3), 1L, "signup", 1.0),
      (4L, ts(0), 2L, "error", 1.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Events.shapleyAttribution(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toMap
    // unanimity game on {click,view}: φ = 1/2 each, 24·φ = 12
    assert(got("click") == ((12L, 0.5, 0.5)), s"got $got")
    assert(got("view") == ((12L, 0.5, 0.5)))
    assert(got("error") == ((0L, 0.0, 0.0)))
    assert(got("signup") == ((0L, 0.0, 0.0)))
  }

  test("shapleyAttribution: efficiency — φ sums to converters with touches") {
    val r = Events.shapleyAttribution(spark, sf)
      .agg(sum("phi24")).collect().head.getLong(0)
    // Σφ = v(full) − v(∅) = converting users with non-empty touched set
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        unix_timestamp(col("ts")).as("t"))
    val fp = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(min("t").as("tp"))
    val touched = ev.join(fp, "user_id")
      .filter(col("t") < col("tp") && col("event_type") =!= "purchase")
      .select("user_id").distinct().count()
    assert(r == 24L * touched, s"phi24 total $r vs 24*$touched")
  }

  test("fdrBh: separated type rejected, identical types not") {
    val dir = java.nio.file.Files.createTempDirectory("fdr").toString
    // types a/b share a distribution; type c sits 100 apart — the two
    // c-pairs must be the only BH rejections
    val rows = (0 until 40).flatMap { i =>
      val jit = (i % 2) * 0.2
      Seq((i * 3L, ts(i), 1L, "a", 1.0 + jit),
        (i * 3L + 1, ts(i), 2L, "b", 1.0 + jit),
        (i * 3L + 2, ts(i), 3L, "c", 101.0 + jit))
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Events.fdrBh(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(4), r.getLong(6))).toMap
    assert(got(("a", "c"))._2 == 1L, s"got $got")
    assert(got(("b", "c"))._2 == 1L)
    assert(got(("a", "b"))._2 == 0L)
    // rejections form a prefix of the p-ranking
    val byRank = Events.fdrBh(spark, dir).collect()
      .map(r => r.getLong(4) -> r.getLong(6)).toMap
    val kMax = byRank.filter(_._2 == 1L).keys.foldLeft(0L)(math.max)
    assert(byRank.forall { case (rk, rej) => rej == (if (rk <= kMax) 1L else 0L) })
  }

  test("ridgeRegression: λ=0 recovers an exact planted linear law") {
    val dir = java.nio.file.Files.createTempDirectory("ridge").toString
    // y = 2·x1 + 3·x2 + 5 exactly, on grid-exact feature values
    val pts = Seq((1.0, 0.0), (0.0, 1.0), (2.0, 1.0), (3.0, 2.0),
      (1.5, 0.5), (4.0, 1.0))
    pts.zipWithIndex.map { case ((x1, x2), i) =>
      (i.toLong, x1, x2, 2.0 * x1 + 3.0 * x2 + 5.0)
    }.toDF("l_orderkey", "l_quantity", "l_discount", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = Ml.ridgeRegression(spark, dir, lambda = 0.0).collect().head
    assert(r.getLong(0) == 6L)
    assert(r.getDouble(1) == 2.0, s"beta1 ${r.getDouble(1)}")
    assert(r.getDouble(2) == 3.0, s"beta2 ${r.getDouble(2)}")
    assert(r.getDouble(3) == 5.0, s"intercept ${r.getDouble(3)}")
  }

  test("ridgeRegression: heavy λ shrinks coefficients toward zero") {
    val loose = Ml.ridgeRegression(spark, sf, lambda = 0.0)
      .collect().head
    val tight = Ml.ridgeRegression(spark, sf, lambda = 1e9)
      .collect().head
    assert(math.abs(tight.getDouble(1)) < math.abs(loose.getDouble(1)))
    assert(math.abs(tight.getDouble(3)) < math.abs(loose.getDouble(3)))
  }

  test("graphChurn: hand-built two-period edge sets") {
    val dir = java.nio.file.Files.createTempDirectory("churn").toString
    // orders at day 0 (pre) and day 100 (post); midpoint = day 50
    def od(day: Int) = new Timestamp(1700000000000L + day * 86400000L)
    Seq(
      (1L, 1L, od(0)), (2L, 1L, od(100)),   // cust 1: pre + post
      (3L, 2L, od(0)),                      // cust 2: pre only
      (4L, 3L, od(100))                     // cust 3: post only
    ).toDF("o_orderkey", "o_custkey", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq(
      (1L, 10L), (2L, 10L),  // cust1–supp10 persists
      (3L, 20L),             // cust2–supp20 dropped
      (4L, 30L)              // cust3–supp30 appeared
    ).toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = Graph.graphChurn(spark, dir).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((2L, 2L, 1L, 1L, 1L)), s"got $r")
    assert(r.getDouble(5) == math.floor(1.0 / 3.0 * 1e6 + 0.5) / 1e6)
  }

  test("keynessG2: hand-computed 2×2 Dunning statistic") {
    val dir = java.nio.file.Files.createTempDirectory("keyn").toString
    Seq((1L, "foo foo bar", "en", "src0", 11L),
      (2L, "baz bar", "en", "src1", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextStats.keynessG2(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getString(4))).toMap
    // foo: a=2,b=0, NA=3,NB=2 → G² = 2·2·ln(2·5/(3·2))
    val lqFoo = math.floor(math.log(2.0 * 5.0 / (3.0 * 2.0)) * 1e9 + 0.5)
    val g2Foo = math.floor(2.0 * (2.0 * lqFoo) / 1e9 * 1e6 + 0.5) / 1e6
    assert(got("foo") == ((2L, 0L, g2Foo, "src0")), s"got $got")
    // bar is perfectly balanced against the 3:2 totals? a=1,b=1 —
    // expected under H0: Ea = 3·2/5 = 1.2, Eb = 0.8 → small positive G²
    assert(got("bar")._3 > 0.0)
    assert(got("baz")._4 == "rest")
  }

  test("lateralJoinTopk: matches the window-function top-2 per order") {
    val lateral = Relational.lateralJoinTopk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(2))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("l_orderkey")
      .orderBy(col("l_extendedprice").desc, col("l_linenumber"))
    val viaWindow = Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= lit("1996-03-01") &&
        col("o_orderdate") < lit("1996-04-01"))
      .join(Tables.lineitem(spark, sf),
        col("o_orderkey") === col("l_orderkey"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .select("o_orderkey", "l_linenumber").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(lateral.nonEmpty)
    assert(lateral == viaWindow,
      s"lateral ${lateral.size} rows vs window ${viaWindow.size}")
  }
}
