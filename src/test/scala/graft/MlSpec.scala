package graft

import scala.collection.mutable
import graft.operators.Ml

class MlSpec extends SparkSpec {
  import spark.implicits._

  private val tiny = Seq(
    (0L, 1.0, Seq(1, 2)),
    (1L, 0.0, Seq(2, 3)),
    (2L, 1.0, Seq(1, 3)),
    (3L, 0.0, Seq(4)),
    (4L, 1.0, Seq(1, 2, 3)),
    (5L, 0.0, Seq(2, 4))
  )

  /** plain-Scala re-derivation of the reference update rule */
  private def seqSgd(insts: Seq[(Long, Double, Seq[Int])],
                     delta: Double): Map[Int, Double] = {
    val w = mutable.HashMap.empty[Int, Double].withDefaultValue(0.0)
    insts.foreach { case (_, label, feats) =>
      val prob = 1.0 / (1.0 + math.exp(-feats.map(w).sum))
      val g = (label - prob) * delta
      feats.foreach(f => w(f) += g)
    }
    w.toMap
  }

  test("trainSgd reproduces the hand-traced sequential fold exactly") {
    val df = tiny.toDF("docid", "label", "features")
    val got = Ml.trainSgd(spark, df).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = seqSgd(tiny.sortBy(_._1), Ml.DefaultDelta)
    assert(got.keySet == want.keySet.map(_.toLong))
    got.foreach { case (f, w) => assert(math.abs(w - want(f.toInt)) < 1e-15) }
    // first-step sanity: instance 0 sees score 0 => prob 0.5,
    // so w(1)=w(2)=+0.001 before instance 1 runs
    assert(want(1) != 0.0)
  }

  test("shuffled trainer is reproducible under a fixed seed") {
    val df = tiny.toDF("docid", "label", "features")
    val a = Ml.trainSgd(spark, df, shuffleSeed = Some(42L)).collect().toSet
    val b = Ml.trainSgd(spark, df, shuffleSeed = Some(42L)).collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("apply scores = sum of weights, classify on sign") {
    val df = tiny.toDF("docid", "label", "features")
    val model = Seq((1, 2.0), (2, -0.5), (4, -3.0)).toDF("feature", "weight")
    val got = Ml.applyModel(df, model).collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getString(3))).toMap
    assert(math.abs(got(0L)._1 - 1.5) < 1e-15 && got(0L)._2 == "spam")
    assert(math.abs(got(1L)._1 - (-0.5)) < 1e-15 && got(1L)._2 == "ham")
    assert(math.abs(got(3L)._1 - (-3.0)) < 1e-15 && got(3L)._2 == "ham")
    assert(math.abs(got(5L)._1 - (-3.5)) < 1e-15 && got(5L)._2 == "ham")
  }

  test("ensemble: average and vote can disagree (hand-built models)") {
    val df = Seq((0L, 1.0, Seq(1))).toDF("docid", "label", "features")
    // scores: +10, -1, -1 -> average +8/3 = spam, vote -1 = ham
    val models = Seq(
      Seq((1, 10.0)).toDF("feature", "weight"),
      Seq((1, -1.0)).toDF("feature", "weight"),
      Seq((1, -1.0)).toDF("feature", "weight"))
    val avg = Ml.applyEnsemble(df, models, "average").collect()(0)
    val vote = Ml.applyEnsemble(df, models, "vote").collect()(0)
    assert(avg.getAs[String]("pred") == "spam")
    assert(vote.getAs[String]("pred") == "ham")
    assert(vote.getAs[Int]("votes") == -1)
    assertThrows[IllegalArgumentException](
      Ml.applyEnsemble(df, models, "median"))
  }

  test("fixture training separates en from non-en better than chance") {
    val inst = Ml.featurize(spark, sf)
    val scored = Ml.applyModel(inst, Ml.trainSgd(spark, inst))
    val agree = scored.filter(
      (scored("label") === 1.0) === (scored("pred") === "spam")).count()
    val total = scored.count()
    assert(total > 0 && agree.toDouble / total > 0.5)
  }
}
