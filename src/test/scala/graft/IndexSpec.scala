package graft

import graft.operators.Index

class IndexSpec extends SparkSpec {

  test("postfix evaluator: AND is intersection, OR is union (tiny corpus)") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a b c"), (1L, "a b"), (2L, "a"), (3L, "c d")
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("idx").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")

    def ids(q: String): Set[Long] =
      Index.booleanQuery(spark, dir, q).collect().map(_.getLong(0)).toSet

    assert(ids("a b AND") == Set(0L, 1L))
    assert(ids("a b AND c OR") == Set(0L, 1L, 3L))
    assert(ids("c d AND") == Set(3L))
    assert(ids("a d OR") == Set(0L, 1L, 2L, 3L))
    assertThrows[IllegalArgumentException](ids("a b"))
  }

  test("TermStore point lookup equals the distributed termLookup") {
    val viaStore = Index.termStoreLookup(spark, sf, Seq("spark"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    val direct = Index.termLookup(spark, sf, "spark")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(viaStore.nonEmpty && viaStore == direct)
    // absent term → empty postings, not an error
    val store = graft.sources.TermStore.parquetBacked(spark,
      { val p = java.nio.file.Files.createTempDirectory("ts").toString
        graft.sources.TermStore.write(Index.postingsLists(spark, sf), p); p })
    assert(store.fetchPostings("zzz_no_such_term_zzz").isEmpty)
    assert(store.fetchDocumentSet("zzz_no_such_term_zzz").isEmpty)
    store.close()
  }

  test("df equals number of docs in posting list") {
    val pl = Index.postingsLists(spark, sf)
    import org.apache.spark.sql.functions._
    val bad = pl.filter(col("df") =!= size(col("postings"))).count()
    assert(bad == 0 && pl.count() > 0)
  }

  test("postings are doc-id sorted within each term") {
    val row = Index.postingsLists(spark, sf).limit(5).collect()
    row.foreach { r =>
      val ids = r.getSeq[org.apache.spark.sql.Row](2).map(_.getLong(0))
      assert(ids == ids.sorted)
    }
  }
}
