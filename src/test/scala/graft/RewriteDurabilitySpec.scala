package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.sources.{Filter, GreaterThanOrEqual}

/** Durability contract of the overwrite-by-filter per-file rewrite
  * (VERDICT r9 #1/#2): the original part file is never deleted before
  * its replacement is in place, and no hidden `.rw.*` artifact —
  * tmp or bak — survives any outcome (success, empty survivor set,
  * or a write-side failure).
  */
class RewriteDurabilitySpec extends graft.SparkSpec {

  private def stage(lines: Seq[String]): (String, String) = {
    val dir = Files.createTempDirectory("graft_rw_spec").toString
    val f = Paths.get(dir, "part-0.txt")
    Files.writeString(f, lines.mkString("", "\n", "\n"))
    (dir, f.toString)
  }

  /** Our rewrite artifacts only — the local ChecksumFileSystem also
    * drops hidden `.crc` sidecars, which are Hadoop's, not ours. */
  private def hidden(dir: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    Files.list(Paths.get(dir)).iterator().asScala
      .map(_.getFileName.toString).filter(_.contains(".rw.")).toSeq
  }

  private def conf = new SerializableHadoopConf(
    spark.sparkContext.hadoopConfiguration)

  private val dropGe5: Seq[Filter] = Seq(GreaterThanOrEqual("src", 5L))

  test("successful rewrite keeps only survivors; no .rw. tmp/bak left") {
    val (dir, f) = stage(Seq("1 2 3", "5 6", "9 1", "2 7"))
    try {
      AdjacencySource.rewriteDropping(f, dropGe5, conf)
      val back = Files.readAllLines(Paths.get(f))
      assert(back.toArray.toSeq == Seq("1 2 3", "2 7"))
      assert(hidden(dir).isEmpty, s"leaked hidden files: ${hidden(dir)}")
    } finally deleteRec(dir)
  }

  test("empty survivor set deletes the part file; no hidden leftovers") {
    val (dir, f) = stage(Seq("7 2", "9 1"))
    try {
      AdjacencySource.rewriteDropping(f, dropGe5, conf)
      assert(!Files.exists(Paths.get(f)))
      assert(hidden(dir).isEmpty, s"leaked hidden files: ${hidden(dir)}")
    } finally deleteRec(dir)
  }

  test("write-side failure leaves the original part file untouched") {
    val (dir, f) = stage(Seq("1 2", "9 1"))
    try {
      // outside a task the tmp name is deterministic (.…rw.driver.tmp);
      // planting a NON-EMPTY directory there makes fs.create throw
      // (and keeps the finally's non-recursive delete from removing
      // the plant) — the original must survive the failed attempt
      val tmp = Paths.get(dir, ".part-0.txt.rw.driver.tmp")
      Files.createDirectory(tmp)
      Files.writeString(tmp.resolve("keep"), "x")
      intercept[java.io.IOException] {
        AdjacencySource.rewriteDropping(f, dropGe5, conf)
      }
      assert(Files.readAllLines(Paths.get(f)).toArray.toSeq ==
        Seq("1 2", "9 1"))
    } finally deleteRec(dir)
  }

  test("RETRY after a mid-finalize kill recovers from the orphaned " +
    ".bak and sweeps every stale artifact (round-10 review)") {
    // simulate the kill window: a prior attempt renamed the original
    // aside to its attempt-suffixed .bak (and leaked its tmp), then
    // died before renaming its tmp into place
    val (dir, f) = stage(Seq("1 2 3", "5 6", "2 7"))
    try {
      Files.move(Paths.get(f), Paths.get(dir, ".part-0.txt.rw.41.bak"))
      Files.writeString(Paths.get(dir, ".part-0.txt.rw.41.tmp"), "1 2 3\n")
      AdjacencySource.rewriteDropping(f, dropGe5, conf)
      assert(Files.readAllLines(Paths.get(f)).toArray.toSeq ==
        Seq("1 2 3", "2 7"))
      assert(hidden(dir).isEmpty, s"leaked hidden files: ${hidden(dir)}")
    } finally deleteRec(dir)
  }

  test("RETRY recovery with an empty survivor set drops the file AND " +
    "the orphan .bak") {
    val (dir, f) = stage(Seq("7 2", "9 1"))
    try {
      Files.move(Paths.get(f), Paths.get(dir, ".part-0.txt.rw.77.bak"))
      AdjacencySource.rewriteDropping(f, dropGe5, conf)
      assert(!Files.exists(Paths.get(f)))
      assert(hidden(dir).isEmpty, s"leaked hidden files: ${hidden(dir)}")
    } finally deleteRec(dir)
  }

  test("missing file with no .bak fails loudly, not silently") {
    val dir = Files.createTempDirectory("graft_rw_spec").toString
    try {
      intercept[java.io.IOException] {
        AdjacencySource.rewriteDropping(
          s"$dir/part-0.txt", dropGe5, conf)
      }
    } finally deleteRec(dir)
  }

  test("streaming-sink epoch commit deletes stale same-epoch files a " +
    "narrower replay did not rewrite (round-10 review)") {
    val dir = Files.createTempDirectory("graft_rw_epoch").toString
    try {
      // the crashed original committed partitions 0 and 7; the replay
      // plans ONLY partition 0 — its commit must remove part-e5-7.adj
      Files.writeString(Paths.get(dir, "part-e5-0.adj"), "1 2\n")
      Files.writeString(Paths.get(dir, "part-e5-7.adj"), "9 9\n")
      Files.writeString(Paths.get(dir, "part-e4-3.adj"), "4 4\n") // other epoch
      Files.writeString(Paths.get(dir, ".part-e5-0-12.adj.tmp"), "1 2\n1 3\n")
      val w = new AdjacencyStreamingWrite(dir, conf)
      w.commit(5L, Array(AdjacencyCommit(
        s"$dir/.part-e5-0-12.adj.tmp", s"$dir/part-e5-0.adj")))
      import scala.jdk.CollectionConverters._
      val names = Files.list(Paths.get(dir)).iterator().asScala
        .map(_.getFileName.toString)
        .filterNot(_.startsWith(".")).toSeq.sorted
      assert(names == Seq("part-e4-3.adj", "part-e5-0.adj"), names)
      assert(Files.readAllLines(Paths.get(dir, "part-e5-0.adj"))
        .toArray.toSeq == Seq("1 2", "1 3"))
    } finally deleteRec(dir)
  }

  test("unsupported delete condition is rejected before touching files") {
    val (dir, f) = stage(Seq("1 2"))
    try {
      intercept[IllegalArgumentException] {
        AdjacencySource.rewriteDropping(
          f, Seq(org.apache.spark.sql.sources.EqualTo("dst", 2L)), conf)
      }
      assert(Files.readAllLines(Paths.get(f)).toArray.toSeq == Seq("1 2"))
      assert(hidden(dir).isEmpty)
    } finally deleteRec(dir)
  }

  private def deleteRec(dir: String): Unit = {
    import scala.jdk.CollectionConverters._
    val p = Paths.get(dir)
    if (Files.exists(p))
      Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(Files.deleteIfExists(_))
  }
}
