package graft

import org.apache.spark.sql.functions._
import graft.sources.CatalogAudit

/** W532: the DSv2 `TableCatalog` over adjacency tables and the
  * connector's OVERWRITE-BY-FILTER write path (delete condition
  * translated by Catalyst, surviving lines rewritten by a distributed
  * per-file job, new data appended).
  */
class CatalogSpec extends SparkSpec {

  private def withCatalog[T](body: (String, String) => T): T = {
    val root = java.nio.file.Files
      .createTempDirectory("graft_cat_spec").toString
    val cat = s"graft_spec_cat${System.nanoTime()}"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.AdjacencyCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    try body(cat, root)
    finally {
      import scala.jdk.CollectionConverters._
      val p = java.nio.file.Paths.get(root)
      if (java.nio.file.Files.exists(p))
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("overwriteAudit: catalog CTAS + overwrite-by-filter readback " +
    "equals the batch restatement") {
    val nation = Tables.nation(spark, sf)
    val olde = nation.select(col("n_regionkey").cast("long").as("src"),
      col("n_nationkey").cast("long").as("dst"))
    val newe = nation.filter(col("n_nationkey") >= 2)
      .select(col("n_nationkey").cast("long").as("src"),
        col("n_regionkey").cast("long").as("dst"))
    val want = olde.filter(col("src") < 2).union(newe)
      .groupBy("src")
      .agg(count(lit(1)).as("n_edges"), sum("dst").as("dst_sum"))
      .orderBy("src")
      .collect().map(_.toString).toSeq
    val got = CatalogAudit.overwriteAudit(spark, sf)
      .collect().map(_.toString).toSeq
    assert(got == want)
  }

  test("DELETE FROM (W554): distributed rewrite leaves exactly the " +
    "survivors; a non-src condition fails loudly") {
    withCatalog { (cat, _) =>
      spark.range(100).select((col("id") % 20).as("src"),
          (col("id") % 7).as("dst"))
        .writeTo(s"$cat.edges").create()
      spark.sql(s"DELETE FROM $cat.edges WHERE src >= 10")
      val got = spark.table(s"$cat.edges")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      val want = spark.range(100).select((col("id") % 20).as("src"),
          (col("id") % 7).as("dst"))
        .where(col("src") < 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      assert(got == want && got.nonEmpty)
      // delete everything that's left: empty table, not an error
      spark.sql(s"DELETE FROM $cat.edges WHERE src >= 0")
      assert(spark.table(s"$cat.edges").count() == 0)
      // a condition on dst is not translatable to the src-key rewrite:
      // canDeleteWhere=false → the statement fails, data untouched
      spark.range(5).select(col("id").as("src"), col("id").as("dst"))
        .writeTo(s"$cat.edges").append()
      val ex = intercept[Exception] {
        spark.sql(s"DELETE FROM $cat.edges WHERE dst = 3")
      }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(e =>
          Option(e.getMessage).toSeq ++ msgs(e.getCause))
      assert(msgs(ex).nonEmpty, ex)
      assert(spark.table(s"$cat.edges").count() == 5)
      // SQL TRUNCATE TABLE rides TruncatableTable (SupportsDelete's
      // parent): deleteWhere(TRUE) → every part file dropped
      spark.sql(s"TRUNCATE TABLE $cat.edges")
      assert(spark.table(s"$cat.edges").count() == 0)
    }
  }

  test("gate: deleteAudit census equals the oracle restatement") {
    val got = CatalogAudit.deleteAudit(spark, sf)
      .collect().map(_.toString).toSeq
    val want = Tables.nation(spark, sf)
      .where(col("n_nationkey") < 12)
      .groupBy(col("n_regionkey").cast("long").as("dst"))
      .agg(count(lit(1)).as("n_edges"),
        sum(col("n_nationkey").cast("long")).as("src_sum"))
      .orderBy("dst").collect().map(_.toString).toSeq
    assert(got == want)
  }

  test("overwrite on a non-src condition is rejected, not approximated") {
    withCatalog { (cat, _) =>
      val edges = spark.range(10).select(col("id").as("src"),
        (col("id") + 1).as("dst"))
      edges.writeTo(s"$cat.edges").create()
      val ex = intercept[Exception] {
        edges.writeTo(s"$cat.edges").overwrite(col("dst") === lit(3L))
      }
      // the require fires inside the write resolution; message names
      // the supported shapes
      assert(ex.getMessage.contains("src-key comparisons") ||
        Option(ex.getCause).exists(
          _.getMessage.contains("src-key comparisons")),
        s"unexpected error: $ex")
      // and the table is untouched
      assert(spark.table(s"$cat.edges").count() == 10)
    }
  }

  test("catalog surface: SHOW TABLES lists, RENAME moves, DROP removes") {
    withCatalog { (cat, _) =>
      spark.range(5).select(col("id").as("src"), (col("id") * 2).as("dst"))
        .writeTo(s"$cat.g1").create()
      val listed = spark.sql(s"SHOW TABLES IN $cat")
        .select("tableName").collect().map(_.getString(0)).toSet
      assert(listed == Set("g1"))
      // the RENAME target is resolved relative to the source's catalog
      spark.sql(s"ALTER TABLE $cat.g1 RENAME TO g2")
      assert(spark.table(s"$cat.g2").count() == 5)
      spark.sql(s"DROP TABLE $cat.g2")
      val after = spark.sql(s"SHOW TABLES IN $cat")
        .select("tableName").collect().map(_.getString(0)).toSet
      assert(after.isEmpty)
    }
  }

  test("mode(overwrite) on the path API still truncates (AlwaysTrue " +
    "via SupportsOverwrite's default)") {
    withCatalog { (_, root) =>
      val p = s"$root/plain"
      val e1 = spark.range(6).select(col("id").as("src"),
        (col("id") + 10).as("dst"))
      e1.write.format("graft-adjacency").mode("append").save(p)
      val e2 = spark.range(3).select((col("id") + 100).as("src"),
        col("id").as("dst"))
      e2.write.format("graft-adjacency").mode("overwrite").save(p)
      val back = spark.read.format("graft-adjacency").load(p)
      assert(back.count() == 3)
      assert(back.agg(min("src")).head().getLong(0) == 100L)
    }
  }
}
