package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.operators.Curation

/** Property check: the distributed secondary-sort packing fold equals
  * an in-memory greedy oracle on random corpora, for random bucket
  * counts and capacities. Case count kept low: each case runs real
  * Spark jobs.
  */
class PackingPropertySpec extends SparkSpec {
  import spark.implicits._

  /** In-memory greedy oracle: per bucket, in doc order, same rule as
    * `Curation.packDocs`.
    */
  private def oracle(docs: List[(Long, Long)], buckets: Int,
                     cap: Int): Map[Long, (Long, Long, Long)] =
    docs.groupBy { case (id, _) => id % buckets }.flatMap {
      case (bucket, ds) =>
        var bin = 0L
        var fill = 0L
        ds.sortBy(_._1).zipWithIndex.map { case ((id, n), i) =>
          if (i == 0) { bin = 0; fill = n }
          else if (fill + n > cap) { bin += 1; fill = n }
          else fill += n
          id -> (bucket.toLong, bin, fill)
        }
    }

  private val corpusGen: Gen[(List[(Long, Long)], Int, Int)] = for {
    n <- Gen.choose(1, 40)
    ids <- Gen.listOfN(n, Gen.choose(0L, 500L))
    docs <- Gen.sequence[List[(Long, Long)], (Long, Long)](
      ids.distinct.map(id => Gen.choose(0L, 30L).map(id -> _)))
    buckets <- Gen.choose(1, 5)
    cap <- Gen.choose(5, 60)
  } yield (docs, buckets, cap)

  test("random corpora: distributed packing == greedy oracle") {
    val prop = Prop.forAllNoShrink(corpusGen) { case (docs, buckets, cap) =>
      val df = docs.toDF("doc_id", "n_tokens")
      val got = Curation.packDocs(df, buckets, cap).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
      val want = oracle(docs, buckets, cap)
      if (got != want)
        println(s"COUNTEREXAMPLE docs=$docs buckets=$buckets cap=$cap " +
          s"got=$got want=$want")
      got == want
    }
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(10)
      .withInitialSeed(org.scalacheck.rng.Seed(7L))
    val res = SCTest.check(params, prop)
    assert(res.passed, res.status.toString)
  }
}
