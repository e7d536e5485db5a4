package graft

import org.apache.spark.sql.functions._
import graft.operators.TextStats

class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val tinyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("ts").toString
    Seq(
      (0L, "the cat and the hat of doom"),   // en stopwords
      (1L, "el la que y los dias"),          // es stopwords
      (2L, "xyzzy plugh qwerty")             // no stopwords -> und
    ).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("langId: argmax over stopword lists, und when nothing matches") {
    val got = TextStats.langId(spark, tinyDir).collect()
      .map(r => r.getLong(0) -> r.getAs[String]("pred_lang")).toMap
    assert(got == Map(0L -> "en", 1L -> "es", 2L -> "und"))
  }

  test("quality features on a known document") {
    val r = TextStats.quality(spark, tinyDir)
      .filter($"doc_id" === 0L).collect()(0)
    assert(r.getAs[Int]("n_tokens") == 7)
    // tokens: the cat and the hat of doom -> lens 3,3,3,3,3,2,4 = 21/7 = 3.0
    assert(math.abs(r.getAs[Double]("avg_token_len") - 3.0) < 1e-9)
    // stopwords among en list: the, and, the, of -> 4/7
    assert(math.abs(r.getAs[Double]("stopword_ratio") - 4.0 / 7) < 1e-6)
  }

  test("tokenCounts: whitespace vs bpe-ish on punctuation") {
    val dir = java.nio.file.Files.createTempDirectory("tc").toString
    Seq((0L, "Hello, world! a1b")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = TextStats.tokenCounts(spark, dir).collect()(0)
    assert(r.getAs[Int]("ws_tokens") == 3)
    // lower: "hello, world! a1b" -> hello|,|world|!|a|1|b = 7
    assert(r.getAs[Int]("bpe_tokens") == 7)
  }

  test("tokenEntropy: uniform repeats give 0, two balanced types give ln 2") {
    val dir = java.nio.file.Files.createTempDirectory("te").toString
    Seq((0L, "aa aa aa aa"), (1L, "ab cd ab cd")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextStats.tokenEntropy(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows(0L).getAs[Long]("n_tokens") == 4)
    assert(rows(0L).getAs[Long]("n_types") == 1)
    assert(math.abs(rows(0L).getAs[Double]("entropy")) < 1e-9)
    assert(math.abs(rows(0L).getAs[Double]("ttr") - 0.25) < 1e-9)
    assert(math.abs(rows(1L).getAs[Double]("entropy") - math.log(2)) < 1e-6)
    assert(math.abs(rows(1L).getAs[Double]("ttr") - 0.5) < 1e-9)
  }

  test("fingerprints: shared 12-word run implies shared fingerprint") {
    val run = (1 to 12).map(i => s"shared$i").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("fp").toString
    Seq(
      (0L, s"alpha beta gamma $run delta"),
      (1L, s"omega psi $run chi phi"),
      (2L, "totally different words everywhere here now and forever more")
    ).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val fps = TextStats.fingerprints(spark, dir).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert((fps(0L) & fps(1L)).nonEmpty, "shared run must share a fingerprint")
    assert((fps(0L) & fps(2L)).isEmpty)
  }

  test("MisraGries candidates always cover items above N/(m+1)") {
    val agg = new graft.functions.Aggregators.MisraGriesAgg(3)
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 20) {
      // skewed stream over 8 items, folded through random-sized partial
      // buffers that merge pairwise — exercises reduce AND merge paths
      val stream = Seq.fill(200)(s"w${math.min(rnd.nextInt(8), rnd.nextInt(8))}")
      val parts = stream.grouped(1 + rnd.nextInt(30)).toSeq
        .map(_.foldLeft(agg.zero)(agg.reduce))
      val summary = parts.reduce(agg.merge)
      val n = stream.size
      val truth = stream.groupBy(identity).view.mapValues(_.size)
      val must = truth.filter(_._2 > n / 4.0).keys // m+1 = 4
      val cands = agg.finish(summary).toSet
      must.foreach(w => assert(cands(w), s"$w lost from $cands"))
      assert(summary.size <= 3)
    }
  }

  test("heavyHitters equals brute-force HAVING on the fixture") {
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(graft.functions.TextFns.tokenize(col("text"))).as("tok"))
    val n = toks.count()
    val m = 30
    val want = toks.groupBy("tok").count()
      .filter(col("count") * m > n)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = TextStats.heavyHitters(spark, sf, m).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
    assert(got.nonEmpty, "expected at least one heavy hitter in fixture")
  }
}
