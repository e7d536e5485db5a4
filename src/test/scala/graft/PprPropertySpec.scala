package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.operators.Graph

/** Property check: distributed PPR == in-memory sequential oracle on
  * random small digraphs (random dangling nodes, random sources) — the
  * SURVEY §5 scalacheck strategy. Case count kept low: each case runs
  * real Spark jobs.
  */
class PprPropertySpec extends SparkSpec {
  import spark.implicits._

  private val graphGen: Gen[(List[(Long, Long)], Long)] = for {
    n <- Gen.choose(3, 10)
    m <- Gen.choose(2, 20)
    raw <- Gen.listOfN(m, for {
      s <- Gen.choose(0L, n - 1L)
      d <- Gen.choose(0L, n - 1L)
    } yield (s, d))
    edges = raw.filter { case (s, d) => s != d }.distinct
    if edges.nonEmpty
    src <- Gen.oneOf((edges.map(_._1) ++ edges.map(_._2)).distinct)
  } yield (edges, src)

  test("random graphs: distributed == sequential oracle, mass conserved") {
    val prop = Prop.forAllNoShrink(graphGen) { case (edges, src) =>
      val df = edges.toDF("src", "dst")
      val got = Graph.personalizedPageRank(df, Seq(src), 5).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val want = SeqPPR.run(edges, src, 5)
      val sameKeys = got.keySet == want.keySet
      val close = sameKeys && got.forall { case (id, v) =>
        math.abs(v - want(id)) < 1e-10
      }
      val conserved = math.abs(got.values.sum - 1.0) < 1e-10
      if (!(close && conserved))
        println(s"COUNTEREXAMPLE edges=$edges src=$src got=$got want=$want")
      close && conserved
    }
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(8)
      .withInitialSeed(org.scalacheck.rng.Seed(42L))
    val res = SCTest.check(params, prop)
    assert(res.passed, res.status.toString)
  }
}
