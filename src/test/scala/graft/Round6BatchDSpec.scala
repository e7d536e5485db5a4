package graft

import graft.operators.{Curation, Dedup}

/** Round-6 batch D (W495–W496): dup-cluster shape audit and the
  * near-dup × quality contingency.
  */
class Round6BatchDSpec extends SparkSpec {
  import spark.implicits._

  private def writeDocs(dir: String,
                        rows: Seq[(Long, String, String)]): Unit =
    rows.map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

  test("clusterDensityAudit: a sliding-window chain reads as a tree," +
    " not a clique") {
    val dir = java.nio.file.Files.createTempDirectory("cda6").toString
    // 14 distinct letter tokens; docs = windows [1..12], [2..13],
    // [3..14]: j(1,2)=j(2,3)=9/11≥0.8 but j(1,3)=8/12<0.8 → a 3-node
    // chain with 2 edges — the threshold-chaining pathology
    val toks = ('a' to 'n').map(c => s"$c$c")
    def win(from: Int) = toks.slice(from, from + 12).mkString(" ")
    writeDocs(dir, Seq((1L, win(0), "s"), (2L, win(1), "s"),
      (3L, win(2), "s"),
      (4L, "totally unrelated content over here friend", "s")))
    val r = Dedup.clusterDensityAudit(spark, dir).collect().head
    CacheScope.release(spark)
    assert(r.getLong(0) == 1L && r.getLong(1) == 3L, s"clusters: $r")
    assert(r.getLong(2) == 3L, s"max: $r")
    assert(r.getLong(3) == 0L && r.getLong(4) == 1L,
      s"clique/chain: $r")
    // d9 = (2e9*2) div (3*2) = 666666666 → mean 0.666667
    assert(r.getDouble(5) == 0.666667, s"density: $r")
  }

  test("dupQualityMatrix: low-quality identical pair vs rich docs") {
    val dir = java.nio.file.Files.createTempDirectory("dqm6").toString
    val short = "the and of to tiny"
    // stopword-interleaved UNIQUE tokens: high quality (length +
    // stopword ratio), zero shared shingles between A and B (every
    // 3-gram contains a unique token)
    def rich(sfx: String) = (for {
      c1 <- 'a' to 'h'; c2 <- 'a' to 'h'
    } yield s"the $c1$c2$sfx").mkString(" ")
    val richA = rich("x")
    val richB = rich("y")
    writeDocs(dir, Seq((1L, short, "s"), (2L, short, "s"),
      (3L, richA, "s"), (4L, richB, "s")))
    val r = Curation.dupQualityMatrix(spark, dir).collect().head
    CacheScope.release(spark)
    assert(r.getLong(0) == 4L, s"n: $r")
    // median lands on the tied low-quality grid value → the dup pair
    // sits at/below it, both rich docs above
    assert(r.getLong(1) == 0L && r.getLong(2) == 2L, s"dup cells: $r")
    assert(r.getLong(3) == 2L && r.getLong(4) == 0L, s"clean cells: $r")
    assert(r.getDouble(5) == 0.0, s"or: $r")
    assert(r.getDouble(6) == 0.0 && r.getDouble(7) == 1.0,
      s"rates: $r")
  }
}
