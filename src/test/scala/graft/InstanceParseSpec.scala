package graft

import java.nio.file.Files
import graft.operators.Ml
import graft.sources.Sources

/** The reference's spam-instance file format (`docid label feat…`)
  * parses into the engine's instance shape and trains to the exact
  * weights of an in-memory sequential fold — the end-to-end path an A6
  * user migrating from the reference runs.
  */
class InstanceParseSpec extends SparkSpec {

  private val fileLines = Seq(
    "clueweb09-en0000-00-00000 spam 3 7 11",
    "clueweb09-en0000-00-00001 ham 7 13",
    "clueweb09-en0000-00-00002 spam 3 13 13")

  test("parse + sequential train matches the in-memory fold") {
    val f = Files.createTempFile("instances", ".txt")
    Files.write(f, String.join("\n", fileLines: _*).getBytes)
    val parsed = Ml.parseInstances(Sources.readLines(spark, f.toString))
    val rows = parsed.collect().sortBy(_.getLong(0))
    assert(rows.map(_.getString(1)).toSeq ==
      fileLines.map(_.split(" ").head).toSeq, "file order preserved")
    assert(rows.map(_.getDouble(2)).toSeq == Seq(1.0, 0.0, 1.0))
    assert(rows(2).getSeq[Any](3).map(_.toString) == Seq("3", "13", "13"))

    val got = Ml.trainSgd(spark, parsed).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // in-memory replica of the reference's update rule, same order
    val w = scala.collection.mutable.Map.empty[Long, Double]
      .withDefaultValue(0.0)
    val insts = Seq(
      (1.0, Seq(3L, 7L, 11L)), (0.0, Seq(7L, 13L)),
      (1.0, Seq(3L, 13L, 13L)))
    insts.foreach { case (label, feats) =>
      val score = feats.map(w).sum
      val prob = 1.0 / (1.0 + math.exp(-score))
      val g = (label - prob) * Ml.DefaultDelta
      feats.foreach(f => w(f) += g)
    }
    assert(got.keySet == w.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - w(k)) < 1e-15) }
    Files.delete(f)
  }
}
