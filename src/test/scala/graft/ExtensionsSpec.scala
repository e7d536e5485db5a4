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

  test("BandedLevenshteinRule rewrites filter predicates, same results") {
    import org.apache.spark.sql.catalyst.expressions.Levenshtein
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
    // parquet-backed source: a LocalRelation would be constant-folded at
    // optimization time and no Filter node would survive to inspect
    val df = Tables.documents(spark, sf).select(col("doc_id"), col("lang"))
    val filtered = df.filter(levenshtein(col("lang"), lit("en")) <= 1)
    val levs = filtered.queryExecution.optimizedPlan.collect {
      case f: LFilter => f.condition.collect { case l: Levenshtein => l }
    }.flatten
    assert(levs.nonEmpty && levs.forall(_.threshold.isDefined),
      s"expected banded levenshtein in optimized filter, got: $levs")
    // same rows as the unbanded predicate: lang within one edit of "en"
    val kept = filtered.select("lang").distinct()
      .collect().map(_.getString(0)).toSet
    val expected = df.select("lang").distinct().collect().map(_.getString(0))
      .filter { l =>
        // tiny reference DP
        val (a, b) = (l, "en")
        val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
          if (i == 0) j else if (j == 0) i else 0)
        for (i <- 1 to a.length; j <- 1 to b.length)
          d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
            d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        d(a.length)(b.length) <= 1
      }.toSet
    assert(kept == expected, s"kept=$kept expected=$expected")
    // projections keep the full distance (no rewrite outside filters)
    val proj = df.select(levenshtein(col("lang"), lit("en")).as("d"))
    val projLevs = proj.queryExecution.optimizedPlan.expressions.flatMap(
      _.collect { case l: Levenshtein => l })
    assert(projLevs.nonEmpty && projLevs.forall(_.threshold.isEmpty))
  }

  test("jaro_winkler: textbook values, edge cases, SQL surface") {
    def jw(a: String, b: String): Double = spark.sql(
      s"SELECT jaro_winkler('$a', '$b') AS s").collect()(0).getDouble(0)
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("dwayne", "duane") - 0.84) < 1e-12)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < 1e-12)
    assert(jw("ab", "ba") == 0.0)          // window 0: no matches
    assert(jw("abc", "abc") == 1.0)
    assert(jw("", "abc") == 0.0)           // empty side -> 0 (DuckDB parity)
    // below the 0.7 boost threshold the prefix bonus must NOT apply
    assert(math.abs(jw("aaxxxxxx", "aayyyyyy") - 0.5) < 1e-12)
    // symmetry
    assert(jw("jellyfish", "smellyfish") == jw("smellyfish", "jellyfish"))
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

  test("pct_hash and jaccard_sim SQL functions match their Column forms") {
    val viaSql = spark.sql(
      """SELECT pct_hash(id) AS h,
                jaccard_sim(array('a','b','c'), array('b','c','d')) AS j
         FROM range(1, 4)""").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    // pctHash: 1→93, 2→86, 3→79 (same constants as Curation.pctHash)
    assert(viaSql.map(_._1).toSeq == Seq(93L, 86L, 79L))
    assert(viaSql.forall(_._2 == 0.5)) // |{b,c}| / |{a,b,c,d}|
    val viaCol = spark.range(1, 4).select(
      graft.operators.Curation.pctHash(col("id"))).collect()
      .map(_.getLong(0)).toSeq
    assert(viaCol == Seq(93L, 86L, 79L))
  }

  test("jaccard_sim of two empty arrays is null, not DIVIDE_BY_ZERO") {
    val r = spark.sql(
      """SELECT jaccard_sim(array(), array()) AS j0,
                jaccard_sim(array(), array('a')) AS j1""").collect()(0)
    assert(r.isNullAt(0), "J(∅, ∅) must be null under ANSI mode")
    assert(r.getDouble(1) == 0.0)
  }

  test("graft_tokenize in SQL matches the Column-API tokenizer") {
    val df = Seq((1L, "The 'Quick', brown FOX!  jumped2 "))
      .toDF("id", "text")
    df.createOrReplaceTempView("tok_t")
    val viaSql = spark.sql("SELECT graft_tokenize(text) AS ts FROM tok_t")
      .collect()(0).getSeq[String](0)
    val viaCol = df.select(
      graft.functions.TextFns.tokenize(col("text")).as("ts"))
      .collect()(0).getSeq[String](0)
    assert(viaSql == viaCol)
    assert(viaSql == Seq("the", "quick", "brown", "fox", "jumped"))
  }
}
