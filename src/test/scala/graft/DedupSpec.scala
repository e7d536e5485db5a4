package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("shingles: 3-grams, short arrays collapse to one shingle") {
    val df = Seq(
      (Seq("a", "b", "c", "d"), 0), (Seq("a", "b"), 1)
    ).toDF("ts", "id")
    val got = df.select(Dedup.shingles($"ts", 3).as("sh")).collect()
      .map(_.getSeq[String](0))
    assert(got(0) == Seq("a b c", "b c d"))
    assert(got(1) == Seq("a b"))
  }

  test("exact dedup keeps min doc_id and counts duplicates") {
    val dir = java.nio.file.Files.createTempDirectory("dd").toString
    Seq((5L, "x y"), (3L, "x y"), (7L, "z"), (9L, "x y"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Dedup.exact(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(3L -> 3L, 7L -> 1L))
  }

  test("fixture has planted near-dups; jaccard finds them at 0.8") {
    val pairs = Dedup.jaccardPairs(spark, sf, 0.8).collect()
    assert(pairs.nonEmpty, "expected planted near-duplicates in fixture")
    pairs.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.8)
    }
  }

  test("fuzzyPairs: edit values are exact and bounded; subset of simhash") {
    val cand = Dedup.simhashPairs(spark, sf, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val fuzzy = Dedup.fuzzyPairs(spark, sf).collect()
    assert(fuzzy.nonEmpty, "expected planted near-identical docs in fixture")
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    fuzzy.foreach { r =>
      val (a, b, edit) = (r.getLong(0), r.getLong(1), r.getInt(2))
      assert(cand((a, b)), s"($a,$b) not a simhash candidate")
      assert(edit >= 0 && edit <= 40)
      // banded value == true distance (reference DP on the raw texts)
      val (x, y) = (texts(a), texts(b))
      val prev = Array.range(0, y.length + 1)
      for (i <- 1 to x.length) {
        var diag = prev(0); prev(0) = i
        for (j <- 1 to y.length) {
          val t = prev(j)
          prev(j) = math.min(math.min(prev(j) + 1, prev(j - 1) + 1),
            diag + (if (x(i - 1) == y(j - 1)) 0 else 1))
          diag = t
        }
      }
      assert(prev(y.length) == edit, s"($a,$b) edit=$edit != dp=${prev(y.length)}")
    }
  }

  test("minhash LSH (verified) equals exact jaccard on the fixture") {
    val exact = Dedup.jaccardPairs(spark, sf, 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashPairs(spark, sf, 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact)
    assert(exact.nonEmpty)
  }

  test("simhash bank join finds exactly the brute-force Hamming pairs") {
    import graft.expressions.HashExpressions.simhash40
    import graft.functions.TextFns.tokenize
    val got = Dedup.simhashPairs(spark, sf, 3).collect()
    got.foreach(r => assert(r.getInt(2) <= 3 && r.getLong(0) < r.getLong(1)))
    // pigeonhole guarantee: banked candidates == full O(n²) scan
    val sigs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), simhash40(tokenize(col("text"))).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val brute = (for {
      (a, sa) <- sigs; (b, sb) <- sigs
      if a < b && java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (a, b)).toSet
    val banked = got.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banked == brute)
    assert(brute.nonEmpty, "fixture should contain simhash near-dups")
  }

  test("assignCanonical: transitive closure to min id; singletons keep themselves") {
    val pairs = Dedup.minhashPairs(spark, sf, 0.8)
    val assign = Dedup.assignCanonical(spark, sf, pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(assign.keySet == docs)
    // union-find oracle over the pair list
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.collect().foreach { r =>
      val (a, b) = (find(r.getLong(0)), find(r.getLong(1)))
      if (a != b) parent(math.max(a, b)) = math.min(a, b)
    }
    val clusters = docs.groupBy(find)
    clusters.foreach { case (_, members) =>
      val canon = members.min
      members.foreach(m => assert(assign(m) == canon,
        s"doc $m -> ${assign(m)}, want $canon"))
    }
    assert(assign.exists { case (d, c) => d != c },
      "fixture should contain at least one dup cluster")
  }

  test("curation pipeline: every keep passes all three gates; each gate excludes someone") {
    import graft.operators.{Pipeline, TextStats}
    val kept = Pipeline.curate(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(kept.nonEmpty)
    kept.values.foreach(q => assert(q >= 0.2))
    val lang = TextStats.langId(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(r.length - 1)).toMap
    kept.keys.foreach(d => assert(lang(d) == "en"))
    val assign = Dedup.assignCanonical(spark, sf,
        Dedup.minhashPairs(spark, sf, 0.8)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    kept.keys.foreach(d => assert(assign(d) == d, s"kept non-canonical $d"))
    // each gate independently excludes at least one doc
    val all = assign.keySet
    assert((all -- kept.keySet).exists(d => lang(d) != "en"))
    assert((all -- kept.keySet).exists(d => assign(d) != d))
    val qual = TextStats.quality(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(r.length - 1)).toMap
    assert((all -- kept.keySet).exists(d =>
      lang(d) == "en" && assign(d) == d && qual.get(d).exists(_ < 0.2)))
  }

  test("chunkDedup: first occurrence survives, later copies drop") {
    val dir = java.nio.file.Files.createTempDirectory("cd").toString
    Seq((1L, "a b c d"), (2L, "c d e"), (3L, "a b"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Dedup.chunkDedup(spark, dir, width = 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // doc 1: chunks "a b","c d" both novel; doc 2: "c d" dup + "e" novel;
    // doc 3: "a b" dup
    assert(got == Map(1L -> ((2L, 2L)), 2L -> ((2L, 1L)), 3L -> ((1L, 0L))))
  }

  test("incrementalDedup: survivor set = batch minus corpus near-dup partners") {
    val pairs = Dedup.minhashPairs(spark, sf, 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val all = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val batch = all.filter(_ % 5 == 0)
    val hit = pairs.flatMap { case (a, b) =>
      (if (a % 5 == 0 && b % 5 != 0) Seq(a) else Nil) ++
        (if (b % 5 == 0 && a % 5 != 0) Seq(b) else Nil)
    }.toSet
    val got = Dedup.incrementalDedup(spark, sf).collect()
      .map(_.getLong(0)).toSet
    assert(got == batch -- hit)
    assert(got.nonEmpty && got != batch,
      "fixture should drop at least one batch doc")
  }

  test("clusterSizes histogram sums back to the corpus") {
    val hist = Dedup.clusterSizes(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val docs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(hist.map { case (sz, n) => sz * n }.sum == docs)
    assert(hist.exists(_._1 > 1), "fixture should have a multi-doc cluster")
  }
}
