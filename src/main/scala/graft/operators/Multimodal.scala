package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column tier (north-star extras): image/audio/video as
  * opaque `binary` columns with typed metadata, plus a decode /
  * feature-extract stage.
  *
  * The container has no image/audio codecs, so `fakeDecode` is a
  * clearly-marked DETERMINISTIC FAKE: it derives plausible
  * width/height/frame metadata from the blob bytes. Everything around
  * it — the binary schema, the typed Dataset plumbing, per-partition
  * batch shape, and the downstream joins — is real and is what matters
  * at scale; swapping the fake for a codec call changes one function
  * body. The batch boundary is a typed `mapPartitions` rather than a
  * Pandas UDF over `mapInPandas`: this environment has no Python
  * worker for executor-side code (pyspark is driver-tooling only
  * here), and the JVM-native form keeps the decode stage inside the
  * same process — on a Python-enabled cluster the identical pipeline
  * shape swaps `mapPartitions` for `mapInPandas` with an Arrow batch
  * per call (schema, partitioning, and batch granularity carry over
  * one-to-one).
  */
object Multimodal {

  /** One decoded media record (the fake decoder's output schema). */
  case class MediaMeta(doc_id: Long, kind: String, n_bytes: Int,
                       width: Int, height: Int, n_frames: Int)

  /** Media table: the documents fixture's text re-interpreted as opaque
    * blobs with a deterministic kind tag — the schema a real ingest
    * (parquet binary column + metadata) would have.
    */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      col("doc_id"),
      col("text").cast("binary").as("blob"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"))

  /** Metadata projection that needs no decode: byte length, first byte,
    * kind — the cheap pruning columns a scan would push down before any
    * expensive decode at 100 TB.
    */
  def mediaMeta(s: SparkSession, dir: String): DataFrame =
    mediaTable(s, dir).select(
      col("doc_id"),
      col("kind"),
      length(col("blob")).as("n_bytes"),
      ascii(col("blob").cast("string").substr(1, 1)).as("first_byte"))

  /** Media shard planning: bin-pack blobs into fixed-byte-capacity
    * shards — the packing layout an ingest run writes so downstream
    * readers get even-sized media files. Reuses the curation tier's
    * greedy secondary-sort fold (`Curation.packDocs`) with byte
    * lengths as the weight; only the cheap metadata column feeds the
    * plan, blobs themselves never shuffle. Output: (doc_id, bucket,
    * bin, fill) where bin is the shard ordinal within the bucket.
    */
  def shardPlan(s: SparkSession, dir: String,
                buckets: Int = 8, capacity: Int = 2048): DataFrame =
    Curation.packDocs(
      mediaMeta(s, dir).select(col("doc_id"),
        col("n_bytes").cast("long").as("n_tokens")),
      buckets, capacity)

  /** Aspect-ratio bucketing over decoded dimensions — the batching
    * layout multimodal training uses (images of similar aspect batch
    * together so padding waste stays low). Classes come from integer
    * cross-multiplication (4w<3h portrait / 3w>4h wide / else square
    * — no float ratios, so the oracle is exact integer arithmetic).
    * Audio (1×1) is excluded. Aggregation is per (kind, bucket):
    * counts + mean pixel load, the table a shard planner consumes.
    */
  def aspectBuckets(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    decode(s, dir).toDF()
      .filter(col("kind") =!= "audio")
      .select(col("kind"),
        when(col("width") * 4 < col("height") * 3, "portrait")
          .when(col("width") * 3 > col("height") * 4, "wide")
          .otherwise("square").as("bucket"),
        (col("width").cast("long") * col("height")).as("px"))
      .groupBy("kind", "bucket")
      .agg(count(lit(1)).as("n_media"),
        round(avg(col("px")), 2).as("avg_px"))
  }

  /** Per-kind duration statistics over the decoded metadata: videos at
    * 24 fps, audio at 16 kHz sample frames — the media-length profile
    * a shard planner and a training-cost estimate both consume.
    * Runs entirely on the decode output (images have no duration and
    * are excluded); one aggregate per kind.
    */
  def durationStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rate = when(col("kind") === "video", 24.0).otherwise(16000.0)
    decode(s, dir).toDF()
      .filter(col("kind") =!= "image")
      .select(col("kind"),
        (col("n_frames") / rate).as("dur_sec"))
      .groupBy("kind")
      .agg(count(lit(1)).as("n_media"),
        round(percentile(col("dur_sec"), lit(0.5)), 4).as("p50_sec"),
        round(percentile(col("dur_sec"), lit(0.9)), 4).as("p90_sec"),
        round(sum(col("dur_sec")), 4).as("total_sec"))
  }

  /** STUB decoder — deterministic fake. A real implementation would
    * call an image/audio codec per record batch here (mapPartitions is
    * exactly where that batch boundary lives); the fake derives
    * metadata from blob bytes so tests are stable.
    */
  private def fakeDecode(kind: String, blob: Array[Byte]): (Int, Int, Int) = {
    // base-31 fold over the decoded text's CODE POINTS mod 2^40:
    // overflow-free on BIGINT arithmetic and restatable in SQL via
    // ord() for any unicode input (a byte fold would silently diverge
    // from the oracle on non-ASCII text)
    val mask = (1L << 40) - 1
    var h = 7L
    val str = new String(blob, java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (31 * h + cp) & mask
      i += Character.charCount(cp)
    }
    def pick(lo: Int, hi: Int, salt: Int): Int =
      lo + ((h >>> salt) % (hi - lo)).toInt
    kind match {
      case "image" => (pick(64, 4096, 0), pick(64, 4096, 8), 1)
      case "audio" => (1, 1, pick(1000, 48000 * 60, 16))   // samples
      case _       => (pick(320, 1920, 0), pick(240, 1080, 8), pick(24, 7200, 16))
    }
  }

  /** Decode/feature-extract over the media table: typed Dataset,
    * per-partition batches, stubbed codec (see `fakeDecode`).
    */
  def decode(s: SparkSession, dir: String): Dataset[MediaMeta] = {
    import s.implicits._
    mediaTable(s, dir)
      .select("doc_id", "kind", "blob")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, kind, blob) =>
          val (w, h, f) = fakeDecode(kind, blob)
          MediaMeta(id, kind, blob.length, w, h, f)
        }
      }
  }

  /** Feature extraction over the media table — the decode→features
    * stage of a multimodal pipeline, running at the same typed
    * per-partition batch boundary as `decode` (a real extractor would
    * hand each batch to a codec/model here). The DETERMINISTIC FAKE
    * feature is a `bins`-bin code-point histogram of the blob; emitted
    * exploded as (doc_id, kind, bin, cnt), zero bins omitted, so the
    * oracle compares exact integers and downstream ops can pivot it
    * back into a dense vector.
    */
  def featureExtract(s: SparkSession, dir: String, bins: Int = 16): DataFrame = {
    import s.implicits._
    mediaTable(s, dir)
      .select("doc_id", "kind", "blob")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, kind, blob) =>
          val hist = new Array[Long](bins)
          val str = new String(blob, java.nio.charset.StandardCharsets.UTF_8)
          var i = 0
          while (i < str.length) {
            val cp = str.codePointAt(i)
            hist(cp % bins) += 1
            i += Character.charCount(cp)
          }
          (0 until bins).iterator.filter(hist(_) > 0)
            .map(b => (id, kind, b, hist(b)))
        }
      }.toDF("doc_id", "kind", "bin", "cnt")
  }

  /** Frame sampling for video rows: every `stride`-th frame index, the
    * plumbing a frame-level feature extractor would fan out over.
    */
  def sampleFrames(decoded: Dataset[MediaMeta], stride: Int = 100): DataFrame =
    decoded.toDF()
      .filter(col("kind") === "video")
      .select(col("doc_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride)))
          .as("frame_idx"))

  /** Resize planning for image/video rows: fit inside `maxSide`² with
    * aspect preserved, never upscaling — the metadata half of a resize
    * stage (target dims are what the pipeline partitions/budgets on; the
    * pixel transform itself lives behind the stubbed codec boundary).
    * Deterministic floor math so the SQL oracle restates it exactly.
    */
  def resizePlan(decoded: Dataset[MediaMeta], maxSide: Int = 256): DataFrame = {
    val longSide = greatest(col("width"), col("height"))
    val fit = (c: org.apache.spark.sql.Column) =>
      floor(c * maxSide / longSide).cast("int")
    decoded.toDF()
      .filter(col("kind") =!= "audio")
      .select(col("doc_id"), col("kind"), col("width"), col("height"),
        when(longSide > maxSide, fit(col("width")))
          .otherwise(col("width")).as("new_w"),
        when(longSide > maxSide, fit(col("height")))
          .otherwise(col("height")).as("new_h"),
        (longSide > maxSide).as("resized"))
  }

  /** Perceptual-hash (dHash) bucket audit over the media blobs — the
    * planning table for media near-dup: 9 bytes sampled at fixed
    * fractional offsets of each blob, 8 consecutive-comparison bits →
    * an 8-bit dHash; per kind, the bucket-size histogram says how
    * collapsible the corpus is BEFORE anyone pays a verify pass
    * (giant buckets ⇒ near-dup mass; singletons ⇒ don't bother). On a
    * real image corpus the sampler reads decoded luma rows — the fake
    * reads blob bytes; the hashing/bucketing plumbing is identical.
    *
    * Emitting the histogram instead of candidate PAIRS is the scale
    * choice: bucket joins explode quadratically on a collapsible
    * corpus, and the audit's job is to predict exactly that before it
    * happens. One projection + two partial-agg shuffles, all integer.
    */
  def mediaPhashBuckets(s: SparkSession, dir: String): DataFrame = {
    val txt = col("blob").cast("string")
    val len = length(txt)
    // sample 9 bytes at i/8 fractional positions (1-based substr)
    def sample(i: Int) = ascii(expr(
      s"substr(cast(blob as string)," +
        s" cast(floor($i * (length(cast(blob as string)) - 1) / 8.0)" +
        s" as int) + 1, 1)"))
    val bits = (0 until 8).map(i =>
      (sample(i) < sample(i + 1)).cast("int") * lit(1 << i))
    val phash = bits.reduce(_ + _)
    mediaTable(s, dir)
      .filter(len >= 9)
      .select(col("kind"), phash.as("phash"))
      .groupBy("kind", "phash").agg(count(lit(1)).as("bucket_size"))
      .groupBy("kind", "bucket_size")
      .agg(count(lit(1)).as("n_buckets"))
      .orderBy("kind", "bucket_size")
  }

  /** Media near-dup VERIFY stage (W312) — the pair pass
    * [[mediaPhashBuckets]] plans for: candidates share an (kind,
    * 8-bit dHash) bucket, verification compares a FINER 16-bit
    * signature (17 samples at i/16 fractional offsets) by Hamming
    * distance. The two-resolution split is the production media-dedup
    * shape: the coarse hash bounds the join (candidate volume
    * Σ bucket², observable in advance from the bucket audit), the
    * fine signature does per-pair work only inside buckets. Integer
    * end to end — sampled bytes, packed bits, `bit_count` Hamming —
    * so the SQL oracle replays it bit-for-bit. Per kind: candidate
    * pairs, verified pairs (dist ≤ 2), and the verify rate — the
    * number that says whether the coarse buckets are precise or just
    * collapsed.
    */
  def mediaDedupVerify(s: SparkSession, dir: String,
                       maxDist: Int = 2): DataFrame = {
    def sample(points: Int, i: Int) = ascii(expr(
      s"substr(cast(blob as string)," +
        s" cast(floor($i * (length(cast(blob as string)) - 1) / $points.0)" +
        s" as int) + 1, 1)"))
    def pack(points: Int) = (0 until points).map(i =>
      (sample(points, i) < sample(points, i + 1)).cast("long") *
        lit(1L << i)).reduce(_ + _)
    val sigs = graft.CacheScope.track(mediaTable(s, dir)
      .filter(length(col("blob").cast("string")) >= 17)
      .select(col("doc_id"), col("kind"),
        pack(8).as("bucket"), pack(16).as("sig"))
      .persist()) // both sides of the bucket self-join
    def side(sfx: String) = sigs.select(
      col("doc_id").as(s"d$sfx"), col("kind"),
      col("bucket"), col("sig").as(s"sig$sfx"))
    side("1").join(side("2"), Seq("kind", "bucket"))
      .filter(col("d1") < col("d2"))
      .select(col("kind"),
        expr("bit_count(sig1 ^ sig2)").as("dist"))
      .groupBy("kind")
      .agg(count(lit(1)).as("candidate_pairs"),
        sum((col("dist") <= maxDist).cast("long")).as("verified_pairs"))
      .select(col("kind"), col("candidate_pairs"), col("verified_pairs"),
        graft.operators.Events.q(col("verified_pairs").cast("double") /
          col("candidate_pairs"), 6).as("verify_rate"))
      .orderBy("kind")
  }
}
