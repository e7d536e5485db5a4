package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sources.AdjacencyCatalog

/** W556: DSv2 CHECK constraints — a `check` table property persists as
  * a sidecar, `Table.constraints()` reports it ENFORCED, and Catalyst
  * validates every incoming V2 write row against it (a violating row
  * fails the write loudly; nothing lands).
  */
class CheckConstraintSpec extends SparkSpec {

  private def deleteRec(dir: String): Unit = {
    import scala.jdk.CollectionConverters._
    val p = Paths.get(dir)
    if (Files.exists(p))
      Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(Files.deleteIfExists(_))
  }

  test("enforced CHECK rejects violating writes, admits valid ones, " +
    "and DESCRIBE surfaces the constraint") {
    val root = Files.createTempDirectory("graft_check").toString
    val cat = "graft_check_cat"
    try {
      spark.conf.set(s"spark.sql.catalog.$cat",
        classOf[AdjacencyCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.root", root)
      spark.range(5).select(col("id").as("src"), (col("id") + 1).as("dst"))
        .writeTo(s"$cat.edges")
        .tableProperty("check", "src >= 0 AND dst >= 0")
        .create()
      assert(Files.exists(Paths.get(root, "edges", "_checkspec")))
      assert(spark.table(s"$cat.edges").count() == 5)
      // valid append passes
      spark.range(3).select((col("id") + 10).as("src"), lit(0L).as("dst"))
        .writeTo(s"$cat.edges").append()
      assert(spark.table(s"$cat.edges").count() == 8)
      // violating append fails loudly; NOTHING lands
      val ex = intercept[Exception] {
        spark.range(2).select((col("id") - 5).as("src"), col("id").as("dst"))
          .writeTo(s"$cat.edges").append()
      }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(e =>
          Option(e.getMessage).toSeq ++ msgs(e.getCause))
      assert(msgs(ex).exists(m => m.toLowerCase.contains("check") ||
        m.contains("graft_check") || m.toLowerCase.contains("constraint")),
        ex)
      assert(spark.table(s"$cat.edges").count() == 8,
        "a failed constrained write must land nothing")
    } finally {
      deleteRec(root)
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.root")
    }
  }

  test("ALTER TABLE ADD CONSTRAINT validates existing rows; DROP " +
    "CONSTRAINT lifts enforcement") {
    val root = Files.createTempDirectory("graft_check_alter").toString
    val cat = "graft_chka_cat"
    try {
      spark.conf.set(s"spark.sql.catalog.$cat",
        classOf[AdjacencyCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.root", root)
      spark.range(4).select(col("id").as("src"), (col("id") % 2).as("dst"))
        .writeTo(s"$cat.edges").create()
      // adding an ENFORCED constraint the EXISTING data violates must
      // fail and leave the table unconstrained
      val ex = intercept[Exception] {
        spark.sql(s"ALTER TABLE $cat.edges ADD CONSTRAINT bad " +
          "CHECK (src >= 10)")
      }
      assert(Option(ex.getMessage).nonEmpty)
      assert(!Files.exists(Paths.get(root, "edges", "_checkspec")),
        "failed ALTER must not persist the constraint")
      // a satisfiable constraint lands and then enforces writes
      spark.sql(s"ALTER TABLE $cat.edges ADD CONSTRAINT ok " +
        "CHECK (src >= 0)")
      assert(Files.exists(Paths.get(root, "edges", "_checkspec")))
      intercept[Exception] {
        spark.range(1).select(lit(-1L).as("src"), lit(0L).as("dst"))
          .writeTo(s"$cat.edges").append()
      }
      assert(spark.table(s"$cat.edges").count() == 4)
      // DROP lifts it: the same row now lands
      spark.sql(s"ALTER TABLE $cat.edges DROP CONSTRAINT ok")
      spark.range(1).select(lit(-1L).as("src"), lit(0L).as("dst"))
        .writeTo(s"$cat.edges").append()
      assert(spark.table(s"$cat.edges").count() == 5)
    } finally {
      deleteRec(root)
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.root")
    }
  }
}
