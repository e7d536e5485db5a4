package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{CacheScope, Tables}
import graft.expressions.HashExpressions._
import graft.functions.TextFns._

/** Deduplication tier (north-star extras, SURVEY §2.10/§7): exact,
  * n-gram-Jaccard, MinHash+LSH, and SimHash near-duplicate detection
  * over the `documents` table.
  *
  * Scale posture: nothing here is O(n²) over documents. Candidate pairs
  * always come from an equality join on a *key* — the full text hash
  * (exact), a shared shingle (Jaccard), an LSH band bucket (MinHash) or
  * a 10-bit signature bank (SimHash) — so Spark shuffles on that key
  * and only bucket-mates are ever compared. Expensive exact
  * verification runs on candidates only.
  */
object Dedup {

  /** Word n-gram shingles of a token array, space-joined.
    *
    * OPTIMIZATION r11 (guide §4): now the fused codegen expression
    * [[graft.expressions.TextExpressions.WordShingles]] — the former
    * `when(size >= n, transform(slice, ...)).otherwise(...)` composite
    * evaluated an interpreted lambda per shingle, each allocating a
    * sliced sub-array (ShinglesExprSpec pins element-for-element
    * equality against that composite, kept below as
    * [[shinglesBuiltins]]).
    */
  def shingles(ts: Column, n: Int): Column =
    graft.expressions.TextExpressions.wordShingles(ts, n)

  /** The pre-r11 pure-built-ins composite, kept as the reference
    * implementation the equivalence spec compares against. */
  def shinglesBuiltins(ts: Column, n: Int): Column =
    when(size(ts) >= n,
      transform(
        slice(ts, lit(1), greatest(size(ts) - (n - 1), lit(0))),
        (_, i) => concat_ws(" ", slice(ts, i + lit(1), lit(n)))))
      .otherwise(array(concat_ws(" ", ts)))

  // tokenize is projected to an attribute BEFORE the shingle lambda
  // references it: inlined, every per-shingle slice would re-run the
  // whole tokenizer (O(len²) per doc — measured 11s of an 18s query)
  // no filter on shs here: shingles() always yields >=1 element, and a
  // filter over the computed column gets pushed below the exchange
  // with the whole tokenize+shingle expression RE-INLINED into it —
  // one 12s single-task stage at sf0.1 (see memory: lambda re-inlining)
  private def docShinglesTokens(toks: DataFrame, n: Int): DataFrame =
    toks.select(col("doc_id"), array_distinct(shingles(col("ts"), n)).as("shs"))

  private def docShingles(s: SparkSession, dir: String, n: Int): DataFrame =
    docShinglesTokens(TextStats.tokenized(s, dir), n)

  /** Exact dedup: one representative (min doc id) + duplicate count per
    * distinct text. At 100 TB the group key would be xxhash64(text)
    * (cheap shuffle key, collision-checked); text itself keeps the
    * DuckDB oracle byte-exact here.
    */
  def exact(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))
      .select("keep_id", "n_dups")

  /** Exact n-gram-Jaccard near-dup pairs. Candidates = docs sharing at
    * least one shingle (inverted-index self-join); intersection size
    * falls out of the join, union by inclusion-exclusion. `maxShingleDf`
    * drops ubiquitous shingles before the join — the standard prefix/
    * frequency filter that caps bucket skew at scale (hot shingles
    * otherwise quadratically explode the candidate pair count).
    */
  def jaccardPairs(s: SparkSession, dir: String, threshold: Double,
                   n: Int = 3, maxShingleDf: Option[Int] = None): DataFrame = {
    // referenced three times (sizes + both sides of the self-join):
    // cache so tokenize+shingle runs once. Materialized EAGERLY —
    // lazily-persisted plans get recomputed by every concurrent subtree
    // of the final action (cache stampede) instead of computed once.
    val docSh = docShingles(s, dir, n).persist()
    CacheScope.register(docSh)
    val sizes = docSh.select(col("doc_id"), size(col("shs")).as("nsh"))
    val ex0 = docSh.select(col("doc_id"), explode(col("shs")).as("sh"))
    val ex = maxShingleDf match {
      case Some(limit) =>
        val rare = ex0.groupBy("sh").agg(count(lit(1)).as("df"))
          .filter(col("df") <= limit).select("sh")
        ex0.join(rare, "sh")
      case None => ex0
    }
    val a = ex.select(col("doc_id").as("doc_a"), col("sh"))
    val b = ex.select(col("doc_id").as("doc_b"), col("sh"))
    val inter = a.join(b, Seq("sh"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("nsh").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("nsh").as("nb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (col("inter") / (col("na") + col("nb") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** MinHash+LSH near-dup pairs: signature (custom Catalyst expression)
    * → `bands` bands of `numHashes/bands` rows → bucket-join on
    * (band, hash(band slice)) → exact Jaccard verification of the
    * candidates only. With 64 hashes / 16 bands, recall at j≥0.8 is
    * 1-(1-0.8⁴)¹⁶ ≈ 0.9998, so results match the exact operator on all
    * but adversarial inputs while touching a tiny fraction of the pairs.
    */
  def minhashPairs(s: SparkSession, dir: String, threshold: Double,
                   n: Int = 3, numHashes: Int = 64,
                   bands: Int = 16): DataFrame =
    minhashPairsTokens(TextStats.tokenized(s, dir), threshold, n,
      numHashes, bands)

  /** Shingle sets (persisted eagerly) + exploded LSH band buckets
    * `(doc_id, band, bh)` — the shared front half of every MinHash
    * consumer (all-pairs and incremental).
    */
  private def bandedSignatures(toks: DataFrame, n: Int, numHashes: Int,
                               bands: Int): (DataFrame, DataFrame) = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val docSh = docShinglesTokens(toks, n).persist()
    CacheScope.register(docSh) // eager: see jaccardPairs
    val sig = docSh.select(col("doc_id"),
      minhashSignature(col("shs"), numHashes).as("sig"))
    // persist+register (r11): every consumer self-joins `banded` (two
    // reads of one action) — uncached, the 64-permutation MinHash
    // signature pass ran once PER SIDE (StageProbe duplicate-stage
    // sweep); caching the (doc, band, bh) rows is ~3 ints/doc/band
    val banded = CacheScope.register(sig.select(col("doc_id"),
      explode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"),
          hash(slice(col("sig"), b * rows + lit(1), lit(rows))).as("bh")))).as("t"))
      .select(col("doc_id"), col("t.band"), col("t.bh"))
      .persist())
    (docSh, banded)
  }

  /** `minhashPairs` over a pre-tokenized `(doc_id, ts)` frame. */
  def minhashPairsTokens(toks: DataFrame, threshold: Double,
                         n: Int = 3, numHashes: Int = 64,
                         bands: Int = 16): DataFrame = {
    val (docSh, banded) = bandedSignatures(toks, n, numHashes, bands)
    val l = banded.select(col("doc_id").as("doc_a"), col("band"), col("bh"))
    val r = banded.select(col("doc_id").as("doc_b"), col("band"), col("bh"))
    val cand = l.join(r, Seq("band", "bh"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()
    cand
      .join(docSh.select(col("doc_id").as("doc_a"), col("shs").as("sa")), "doc_a")
      .join(docSh.select(col("doc_id").as("doc_b"), col("shs").as("sb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (size(array_intersect(col("sa"), col("sb"))).cast("double") /
          size(array_union(col("sa"), col("sb")))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** SimHash near-dup pairs at Hamming distance ≤ 3: 40-bit signature
    * (custom expression, tf-weighted, SQL-restatable hash — see
    * `SimHash40`) split into 4 10-bit banks; by pigeonhole any pair
    * within distance 3 agrees on ≥1 bank, so the bank join finds all of
    * them without pairwise comparison; exact distance check
    * (`bit_count(xor)`) filters the candidates.
    */
  def simhashPairs(s: SparkSession, dir: String,
                   maxDist: Int = 3): DataFrame = {
    require(maxDist <= 3, "4 banks guarantee recall only to distance 3")
    // token-less documents are dropped (their all-zero signatures would
    // pair every such doc with every other at distance 0, and the SQL
    // oracle's unnest never sees them); barrier keeps the filter from
    // being pushed below the projection with tokenize re-inlined
    val sig = Tables.documents(s, dir)
      .select(col("doc_id"), tokenize(col("text")).as("ts"))
      .filter(graft.expressions.OptimizerBarrier.noPushdown(size(col("ts")) > 0))
      .select(col("doc_id"), simhash40(col("ts")).as("sig"))
      .persist()
    CacheScope.register(sig) // eager: see jaccardPairs
    val banked = sig.select(col("doc_id"), col("sig"),
      explode(expr(
        "transform(sequence(0, 3), " +
          "i -> struct(i AS bank, shiftright(sig, i * 10) & 1023 AS bv))")).as("t"))
      .select(col("doc_id"), col("sig"), col("t.bank"), col("t.bv"))
    val l = banked.select(col("doc_id").as("doc_a"), col("sig").as("sig_a"),
      col("bank"), col("bv"))
    val r = banked.select(col("doc_id").as("doc_b"), col("sig").as("sig_b"),
      col("bank"), col("bv"))
    l.join(r, Seq("bank", "bv"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        expr("bit_count(sig_a ^ sig_b)").as("dist"))
      .distinct()
      .filter(col("dist") <= maxDist)
  }

  /** SimHash radius sweep (W499): near-dup pair volume at Hamming
    * radius 0..`maxDist` over the 40-bit signature — [[lshBandSweep]]'s
    * SimHash-side twin; the table that picks the production radius
    * (radius 0 = hash-exact dups, each +1 bit admits more candidates
    * at falling precision; the knee is the operating point). One
    * banked candidate pass serves every radius (the 4×10-bit
    * pigeonhole join is exhaustive to distance 3), then a 4-row spine
    * classifies by exact distance — no per-radius rescans.
    */
  def simhashRadiusSweep(s: SparkSession, dir: String,
                         maxDist: Int = 3): DataFrame = {
    import s.implicits._
    val pairs = simhashPairs(s, dir, maxDist).persist()
    CacheScope.register(pairs)
    val spine = (0L to maxDist.toLong).toDF("radius")
    broadcast(spine)
      .join(pairs, col("dist") <= col("radius"), "left")
      .groupBy("radius")
      .agg(count(col("dist")).as("n_pairs"),
        coalesce(sum((col("dist") === col("radius")).cast("long")),
          lit(0L)).as("n_at_radius"))
      .orderBy("radius")
  }

  /** Fuzzy dedup: exact edit-distance verification of SimHash
    * candidates. Candidates come from the banked signature join
    * (`simhashPairs` — never all-pairs); the expensive O(len²)
    * levenshtein runs only on those, behind a length-difference
    * prefilter (|len(a)-len(b)| > maxEdit already implies
    * distance > maxEdit, so mismatched-size pairs never reach the
    * quadratic compare). This is the standard candidate→verify
    * shape that keeps fuzzy dedup tractable at corpus scale.
    */
  def fuzzyPairs(s: SparkSession, dir: String, maxDist: Int = 3,
                 maxEdit: Int = 40): DataFrame = {
    val texts = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    simhashPairs(s, dir, maxDist)
      // explicit width FIRST: the candidate set is tiny in ROWS but each
      // row carries O(len·maxEdit) verify work, so AQE's size-based
      // coalesce would funnel the whole verify into one task (measured:
      // a 21 s single-task stage). An explicit partition count is exempt
      // from AQE coalescing; placed before the text joins it spreads the
      // join + filter + DP while shuffling only the id pair, never the
      // texts (which broadcast onto it).
      .repartition(s.sparkContext.defaultParallelism,
        col("doc_a"), col("doc_b"))
      .join(texts.select(col("doc_id").as("doc_a"), col("text").as("ta")), "doc_a")
      .join(texts.select(col("doc_id").as("doc_b"), col("text").as("tb")), "doc_b")
      .filter(abs(length(col("ta")) - length(col("tb"))) <= maxEdit)
      // thresholded levenshtein runs the banded O(len·maxEdit) DP and
      // returns -1 past the band — not the O(len²) full matrix
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("ta"), col("tb"), maxEdit).as("edit"))
      .filter(col("edit") >= 0)
  }

  /** End-to-end dedup assignment — the operator a training-data pipeline
    * actually runs. Near-dup PAIRS are only half the job: duplicates
    * form transitive clusters (a~b, b~c ⇒ {a,b,c}), so the pair list
    * feeds the connected-components loop and every document maps to its
    * cluster's canonical (minimum) doc id; documents with no near-dup
    * map to themselves. Downstream: keep `doc_id = canonical_id` rows,
    * or join on `canonical_id` to propagate the survivor. Scale shape:
    * pairs come from an LSH bucket join (never all-pairs), components
    * from the partitioned label-propagation loop — both already bounded;
    * the final assignment is one left join on doc_id.
    */
  def assignCanonical(s: SparkSession, dir: String,
                      pairs: DataFrame): DataFrame =
    assignCanonicalDocs(Tables.documents(s, dir).select(col("doc_id")), pairs)

  /** `assignCanonical` with an explicit universe of doc ids. */
  def assignCanonicalDocs(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val comps = Graph.connectedComponents(
      pairs.select(col("doc_a").as("src"), col("doc_b").as("dst")))
    docs.join(comps, docs("doc_id") === comps("id"), "left")
      .select(col("doc_id"),
        coalesce(col("comp"), col("doc_id")).as("canonical_id"))
  }

  /** Quality-aware dedup survivorship: instead of `assignCanonical`'s
    * min-id survivor, each dup cluster keeps its HIGHEST-QUALITY
    * member (ties to the lower doc_id) — the policy a real pipeline
    * wants, since the first-crawled copy is often the worst one.
    * Composition: near-dup pairs → components → per-cluster argmax
    * over the quality signal. Returns (doc_id, canonical_id, keep)
    * for every document; the argmax is one per-cluster aggregate over
    * the (tiny relative to corpus) cluster table joined back by key.
    */
  def bestSurvivor(s: SparkSession, dir: String): DataFrame = {
    val assigned = assignCanonical(s, dir, jaccardPairs(s, dir, 0.8))
    val q = TextStats.quality(s, dir).select(col("doc_id"), col("quality"))
    val withQ = assigned.join(q, Seq("doc_id"), "left")
      .select(col("doc_id"), col("canonical_id"),
        coalesce(col("quality"), lit(0.0)).as("quality"))
      .persist()
    CacheScope.register(withQ) // eager: the argmax and the flag join both read it
    // min_by on (-quality, doc_id) = max quality, ties to lower id
    val best = withQ.groupBy("canonical_id")
      .agg(min_by(col("doc_id"),
        struct((-col("quality")).as("nq"), col("doc_id"))).as("keep_id"))
    withQ.join(best, "canonical_id")
      .select(col("doc_id"), col("canonical_id"),
        (col("doc_id") === col("keep_id")).as("keep"))
  }

  /** Jaro-Winkler name-matching pairs (the entity-resolution shape:
    * short strings where edit distance over-penalizes transpositions).
    * Candidates are *blocked* on (2-char name prefix, length band of
    * 4) — the standard ER blocking step, one notch tighter than the
    * classic first-character block: an unblocked self-join is O(n²)
    * however it executes, and block volume is Σ|block|², so splitting
    * each first-char block by second char and length band divides the
    * candidate count by another ~2 orders of magnitude at corpus
    * scale. (JW's prefix weighting means cross-prefix pairs are weak
    * matches by construction, and strings in different length bands
    * can't score high either — the operator's contract is "pairs
    * within a block".) The block key is one equality column Spark
    * shuffles on. Each candidate scores through the native
    * `jaro_winkler` codegen expression once (barrier keeps the
    * threshold filter from re-inlining the score). Threshold is
    * 0.8999, off the rational lattice of Jaro scores, so engine ulp
    * differences cannot flip a boundary pair.
    */
  def jaroWinklerPairs(s: SparkSession, dir: String, mod: Int = 7,
                       threshold: Double = 0.8999): DataFrame = {
    val p = Tables.part(s, dir)
      .filter(pmod(col("p_partkey"), lit(mod)) === 0)
    def blk(n: Column): Column = concat_ws("|",
      substring(n, 1, 2), floor(length(n) / lit(4)).cast("long"))
    val a = p.select(col("p_partkey").as("k1"), col("p_name").as("n1"),
      blk(col("p_name")).as("blk"))
    val b = p.select(col("p_partkey").as("k2"), col("p_name").as("n2"),
      blk(col("p_name")).as("blk"))
    a.join(b, Seq("blk")).filter(col("k1") < col("k2"))
      .select(col("k1"), col("k2"),
        graft.expressions.StringExpressions.jaroWinkler(col("n1"), col("n2"))
          .as("sim"))
      .filter(graft.expressions.OptimizerBarrier.noPushdown(
        col("sim") > threshold))
      .select(col("k1"), col("k2"), round(col("sim"), 6).as("sim"))
  }

  /** Passage-level (chunk) dedup: each document splits into fixed-width
    * token chunks; across the whole corpus the first occurrence of a
    * chunk (by document id, then position) survives and later copies are
    * dropped. Output is the per-document chunk budget — how much of each
    * document a chunk-level deduplicator would keep. One explode + one
    * window over the chunk key + one group-by: the shuffle is keyed on
    * chunk text (at 100 TB: on `xxhash64(chunk)`), so identical passages
    * land together regardless of corpus size; no pairwise comparison
    * exists anywhere.
    */
  def chunkDedup(s: SparkSession, dir: String, width: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = TextStats.tokenized(s, dir).filter(size(col("ts")) > 0)
    // chunk array projected to an attribute before posexplode — same
    // lambda re-inlining hazard as docShinglesTokens above
    val chunked = toks.select(col("doc_id"),
      transform(
        sequence(lit(0),
          ((size(col("ts")) + (width - 1)) / width).cast("int") - 1),
        i => concat_ws(" ", slice(col("ts"), i * width + lit(1), lit(width))))
        .as("chunks"))
    val ex = chunked.select(col("doc_id"),
      posexplode(col("chunks")).as(Seq("pos", "chunk")))
    val marked = ex.withColumn("rn",
      row_number().over(Window.partitionBy("chunk").orderBy("doc_id", "pos")))
    marked.groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        count(when(col("rn") === 1, 1)).as("n_kept"))
  }

  /** Incremental dedup: a "new batch" (deterministic id slice) checked
    * against the standing corpus without re-deduplicating the corpus.
    * Band buckets are computed for all docs, but the join is strictly
    * batch×corpus — at scale the corpus side's signatures are a
    * persisted artifact of previous runs and only the (small) batch
    * recomputes, so cost is O(|batch| · bucket-mates), not O(corpus²).
    * Candidates verify by exact shingle Jaccard; a batch doc survives
    * iff no corpus near-duplicate exists at `threshold`.
    */
  def incrementalDedup(s: SparkSession, dir: String, threshold: Double = 0.8,
                       mod: Int = 5, n: Int = 3, numHashes: Int = 64,
                       bands: Int = 16): DataFrame = {
    val (docSh, banded) = bandedSignatures(
      TextStats.tokenized(s, dir), n, numHashes, bands)
    val isBatch = pmod(col("doc_id"), lit(mod)) === 0
    val bb = banded.filter(isBatch)
      .select(col("doc_id").as("bid"), col("band"), col("bh"))
    val cb = banded.filter(!isBatch)
      .select(col("doc_id").as("cid"), col("band"), col("bh"))
    val cand = bb.join(cb, Seq("band", "bh"))
      .select("bid", "cid").distinct()
    val dropped = cand
      .join(docSh.select(col("doc_id").as("bid"), col("shs").as("sa")), "bid")
      .join(docSh.select(col("doc_id").as("cid"), col("shs").as("sb")), "cid")
      .filter(size(array_intersect(col("sa"), col("sb"))).cast("double") /
        size(array_union(col("sa"), col("sb"))) >= threshold)
      .select(col("bid")).distinct()
    docSh.select(col("doc_id")).filter(isBatch)
      .join(dropped, col("doc_id") === col("bid"), "left_anti")
  }

  /** Duplicate-cluster size histogram: how many clusters of each size
    * the near-dup graph produces — the standard health report after a
    * dedup run (a fat tail here means a hot template or boilerplate
    * family). Two cheap keyed aggregations on top of the canonical
    * assignment; cluster count ≪ doc count, so the second shuffle is
    * tiny at any scale.
    */
  def clusterSizes(s: SparkSession, dir: String): DataFrame =
    assignCanonical(s, dir, minhashPairs(s, dir, 0.8))
      .groupBy(col("canonical_id")).agg(count(lit(1)).as("sz"))
      .groupBy(col("sz")).agg(count(lit(1)).as("n_clusters"))

  /** Sorted-neighborhood ER blocking (Hernández–Stolfo): within each
    * first-token block, order documents by (text, doc_id) and compare
    * only rows at most `window` positions apart, then verify the
    * candidates with exact token-set Jaccard. The comparison count is
    * O(n·window) instead of the block's O(n²) — the fixed-cost
    * blocking strategy when LSH's probabilistic recall isn't wanted.
    * Ranks are per-block (row_number over the block partition), so the
    * sort distributes; no global sequence is ever materialized.
    */
  def sortedNeighborhood(s: SparkSession, dir: String,
                         window: Int = 3,
                         threshold: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // block on the first RAW token, not the distinct set's head: set
    // element order is engine-specific, raw token order is not
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("text"),
        graft.functions.TextFns.tokenize(col("text")).as("ts"))
      .filter(size(col("ts")) > 0)
      .select(col("doc_id"), col("text"),
        array_distinct(col("ts")).as("st"),
        element_at(col("ts"), 1).as("block"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("block").orderBy("text", "doc_id")))
      .persist()
    CacheScope.register(docs) // eager: both sides of the neighborhood join
    val a = docs.select(col("block"), col("rn").as("ra"),
      col("doc_id").as("doc_a"), col("st").as("sa"))
    val b = docs.select(col("block"), col("rn").as("rb"),
      col("doc_id").as("doc_b"), col("st").as("sb"))
    a.join(b, Seq("block"))
      .filter(col("rb") > col("ra") && col("rb") <= col("ra") + window)
      .select(col("doc_a"), col("doc_b"),
        (size(array_intersect(col("sa"), col("sb"))).cast("double") /
          size(array_union(col("sa"), col("sb")))).as("j"))
      .filter(col("j") >= threshold)
      .select(
        least(col("doc_a"), col("doc_b")).as("doc_a"),
        greatest(col("doc_a"), col("doc_b")).as("doc_b"),
        round(col("j"), 6).as("jaccard"))
  }

  /** LSH retrieval join: for each document in a designated query set
    * (`doc_id % mod == 0` stands in for an external query table), the
    * single most-similar corpus document — LSH band candidates, exact
    * Jaccard verification at `threshold`, argmax with ties to the lower
    * doc id; queries with no qualifying match emit a null row (so the
    * result is always one row per query). This is the cross-table
    * near-duplicate lookup a pipeline runs to screen NEW data against
    * an existing corpus (benchmark-contamination / incoming-crawl
    * checks), built by composing [[minhashPairs]]' candidate machinery
    * — same recall argument as `dedup_minhash` (≥0.8 Jaccard pairs
    * survive 64/16 banding with P ≈ 0.9998), so the oracle verifies
    * against exact Jaccard. Scale: candidates shuffle on (band, bh);
    * the per-query argmax is a window over each query's candidate
    * list, partitioned by query — never a corpus-sized sort.
    */
  def lshRetrieve(s: SparkSession, dir: String, mod: Int = 50,
                  threshold: Double = 0.8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val prs = minhashPairs(s, dir, threshold)
    val both = prs
      .select(col("doc_a").as("q"), col("doc_b").as("c"), col("jaccard"))
      .unionAll(prs
        .select(col("doc_b").as("q"), col("doc_a").as("c"), col("jaccard")))
    val cand = both.filter(col("q") % mod === 0 && col("c") % mod =!= 0)
    val w = Window.partitionBy("q").orderBy(col("jaccard").desc, col("c"))
    val best = cand.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    Tables.documents(s, dir).select(col("doc_id").as("query_id"))
      .filter(col("query_id") % mod === 0)
      .join(best, col("query_id") === col("q"), "left")
      .select(col("query_id"), col("c").as("match_id"), col("jaccard"))
  }

  /** Fellegi–Sunter record-linkage weights over blocked part pairs:
    * candidates share a (head-noun, size-band-of-5) block; each of four
    * fields (brand, type, adjective, exact size) contributes
    * log2(m/u) on agreement and log2((1−m)/(1−u)) on disagreement,
    * with m = P(agree | match) and u = P(agree | non-match) FROZEN as
    * documented literals (u from field cardinality; the EM estimation
    * step that fits m/u from data is out of scope — the operator is
    * the scoring join). Pairs scoring ≥ `cutoff` surface, the
    * classifier's "link" region. Blocking keeps the candidate volume
    * Σ|block|² — the noun×band key caps block size, the same
    * quadratic-control argument as [[jaroWinklerPairs]]; the weight is
    * a fixed-order sum of literal doubles, so any engine computes the
    * identical bits.
    */
  def linkageWeights(s: SparkSession, dir: String,
                     cutoff: Double = 4.0): DataFrame = {
    val p = Tables.part(s, dir).select(
      col("p_partkey").as("k"),
      element_at(split(col("p_name"), " "), 1).as("adj"),
      element_at(split(col("p_name"), " "), -1).as("noun"),
      col("p_brand").as("b"), col("p_type").as("t"), col("p_size").as("sz"),
      floor(col("p_size") / 5).cast("long").as("band"))
    def side(suf: String) = p.select(
      col("k").as(s"k$suf"), col("adj").as(s"adj$suf"), col("noun"),
      col("b").as(s"b$suf"), col("t").as(s"t$suf"),
      col("sz").as(s"sz$suf"), col("band"))
    val weight =
      when(col("b1") === col("b2"), lit(4.491853096329675))
        .otherwise(lit(-3.263034405833794)) +
      when(col("t1") === col("t2"), lit(2.3504972470841334))
        .otherwise(lit(-2.473931188332412)) +
      when(col("adj1") === col("adj2"), lit(2.925999418556223))
        .otherwise(lit(-4.129283016944966)) +
      when(col("sz1") === col("sz2"), lit(2.0)).otherwise(lit(-2.0))
    side("1").join(side("2"), Seq("noun", "band"))
      .filter(col("k1") < col("k2"))
      .select(col("k1"), col("k2"), weight.as("w"))
      .filter(col("w") >= cutoff)
      .select(col("k1"), col("k2"), round(col("w"), 6).as("weight"))
  }

  /** Exact-substring span dedup (the token-window method of "Deduplicating
    * Training Data Makes Language Models Better", Lee et al. 2021): every
    * w-token window of every document, counted with multiplicity; a window
    * is DUPLICATED if it occurs in ≥2 distinct documents. Returns per-doc
    * window counts and the duplicated-window fraction — the signal a
    * curation run thresholds to drop or trim span-duplicated documents
    * (doc-level near-dup passes miss a copied paragraph inside an
    * otherwise-unique page; this catches it).
    *
    * Shape: explode → one groupBy on the window key → join back on that
    * same key (co-partitioned from its own aggregate) → per-doc rollup.
    * The window key here is the token text (byte-exact, oracle-friendly);
    * at 100 TB it would be a 64-bit rolling hash of the window
    * ([[graft.expressions.HashExpressions.polyHashArray]], collision-
    * checked) so only 8-byte keys shuffle — same plan otherwise.
    */
  def substringSpans(s: SparkSession, dir: String, w: Int = 20): DataFrame = {
    val ex = TextStats.tokenized(s, dir)
      .select(col("doc_id"), explode(shingles(col("ts"), w)).as("win"))
      .persist()
    CacheScope.register(ex) // eager: global window counts + rollup read it
    val global = ex.groupBy("win")
      .agg(countDistinct(col("doc_id")).as("nd"))
    ex.join(global, "win")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_windows"),
        sum((col("nd") >= 2).cast("long")).as("n_dup_windows"))
      .select(col("doc_id"), col("n_windows"), col("n_dup_windows"),
        round(col("n_dup_windows") / col("n_windows"), 6).as("dup_frac"))
  }

  /** PPJoin-style PREFIX-FILTERED exact set-similarity join (Chaudhuri
    * SSJoin / Xiao PPJoin): same output as [[jaccardPairs]] at the same
    * threshold, but candidates come only from pairs sharing a token in
    * their canonical-order PREFIX — each doc indexes just its
    * `|s| − ⌈t·|s|⌉ + 1` globally-rarest shingles (df-then-shingle
    * order), which is the provably-lossless prefix for Jaccard ≥ t: a
    * qualifying pair's common tokens can't all hide in the suffix
    * (|x∩y| ≥ t·|x| > |suffix|). At t=0.8 the index is ~20% of the
    * corpus, so candidate volume (and bucket skew — rare tokens have
    * tiny df by construction) drops ~25× vs the full inverted-index
    * self-join while staying EXACT, unlike MinHash's probabilistic
    * recall. Verification joins the (small) candidate-pair set back
    * to the full postings on co-located (doc, shingle) keys.
    *
    * The ⌈t·|s|⌉ is computed on the 9-dp-rounded product so binary
    * float fuzz (0.8·5 = 4.0000…004) can't shorten a prefix and cost
    * recall. The CORRECTNESS oracle is the same exact-Jaccard SQL as
    * `dedup_jaccard` — passing means the filter lost nothing.
    */
  def jaccardPrefixFilter(s: SparkSession, dir: String,
                          threshold: Double = 0.8, n: Int = 3): DataFrame =
    prefixPairsRaw(s, dir, threshold, n)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))

  /** [[jaccardPrefixFilter]]'s pipeline with the UNROUNDED jaccard kept
    * on the output — consumers that re-threshold (residualDupAudit
    * splits one tLo pass into tLo/tHi classes) must compare the same
    * unrounded value the filter did, or a 0.7999996 pair would flip
    * class after 6-dp rounding.
    */
  private def prefixPairsRaw(s: SparkSession, dir: String,
                             threshold: Double, n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docSh = docShingles(s, dir, n).persist()
    CacheScope.register(docSh)
    val sizes = docSh.select(col("doc_id"), size(col("shs")).as("nsh"))
    val ex = docSh.select(col("doc_id"), explode(col("shs")).as("sh"))
      .persist()
    CacheScope.register(ex) // eager: df count, prefix, and both verify joins
    val df = ex.groupBy("sh").agg(count(lit(1)).as("df"))
    // NOT cached (r12 revert of the r11 persist): the prefix table does
    // feed both candidate self-join sides, but persisting it regressed
    // the FULL cold board at local[32] (residual_dup_audit 8.2→29.3 s
    // driver wall, anti-scaling 0.23 at 8-vs-32 cores) — the cache
    // materialization + heap pressure of one more in-memory relation on
    // top of docSh/ex costs more at high concurrency than the window
    // recompute it saves (VERDICT r11 #1/#2). The isolated warm −15%
    // CPU reading that justified it did not survive cold full-board
    // conditions; recompute wins here, the same rule as moran_i.
    val prefix = ex.join(df, "sh")
      .withColumn("pos", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("df"), col("sh"))))
      .join(sizes, "doc_id")
      .filter(col("pos") <=
        col("nsh") - ceil(round(lit(threshold) * col("nsh"), 9)) + 1)
      .select("doc_id", "sh")
    val cand = prefix.select(col("doc_id").as("doc_a"), col("sh"))
      .join(prefix.select(col("doc_id").as("doc_b"), col("sh")), "sh")
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    val inter = cand
      .join(ex.select(col("doc_id").as("doc_a"), col("sh")), "doc_a")
      .join(ex.select(col("doc_id").as("doc_b"), col("sh")), Seq("doc_b", "sh"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("nsh").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("nsh").as("nb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (col("inter") / (col("na") + col("nb") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Cross-source corpus overlap matrix: shingle-set Jaccard between
    * every pair of `source` values — the corpus-level dedup telemetry a
    * multi-source pretraining mix needs (how much of source A is
    * already in source B decides dedup order and mixing weights).
    *
    * The pair generator is an inverted shingle→source join over the
    * DISTINCT (source, shingle) projection, so per-shingle fan-out is
    * bounded by the number of sources (a handful), never by document
    * multiplicity: Σ|bucket|² ≤ |sources|²·|shingles| — linear in
    * corpus size at any scale. Set sizes come off the same projection;
    * Jaccard is exact (intersection / union via inclusion-exclusion),
    * rounded to 6 dp on output only (counts are integers — no float
    * parity hazard in the join or cut).
    */
  def sourceOverlap(s: SparkSession, dir: String, n: Int = 3): DataFrame = {
    val ts = Tables.documents(s, dir)
      .select(col("source"), tokenize(col("text")).as("ts"))
    val ex = ts
      .select(col("source"), explode(array_distinct(shingles(col("ts"), n)))
        .as("sh"))
      .distinct()
      .persist()
    CacheScope.register(ex) // eager: sizes + both join sides read it
    val sizes = ex.groupBy("source").agg(count(lit(1)).as("n"))
    ex.join(ex.select(col("sh"), col("source").as("src_b")), "sh")
      .filter(col("source") < col("src_b"))
      .groupBy(col("source").as("src_a"), col("src_b"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("source").as("src_a"), col("n").as("na")), "src_a")
      .join(sizes.select(col("source").as("src_b"), col("n").as("nb")), "src_b")
      .select(col("src_a"), col("src_b"), col("inter"),
        round(col("inter") / (col("na") + col("nb") - col("inter")), 6)
          .as("jaccard"))
      .orderBy(col("src_a"), col("src_b"))
  }

  /** Containment near-dup pairs: |A∩B| / |A| ≥ threshold, the
    * ASYMMETRIC cousin of Jaccard that catches "short doc embedded in
    * long doc" — a pair Jaccard misses because the union is dominated
    * by the long side (the quote/boilerplate-inclusion case every
    * web-corpus dedup needs). Same inverted-index candidate generation
    * as [[jaccardPairs]] (equality join on the shingle key — shuffles
    * on shingles, never pairs, df-cap available for hot shingles), but
    * emitted DIRECTED: (contained, container) whenever the smaller
    * side's coverage clears the threshold. Output is each contained
    * doc's best container (max containment, min container id tiebreak).
    */
  def containmentPairs(s: SparkSession, dir: String, threshold: Double,
                       n: Int = 3): DataFrame = {
    val docSh = docShingles(s, dir, n).persist()
    CacheScope.register(docSh) // eager: sizes + both join sides read it
    val sizes = docSh.select(col("doc_id"), size(col("shs")).as("nsh"))
    val ex = docSh.select(col("doc_id"), explode(col("shs")).as("sh"))
    val inter = ex.select(col("doc_id").as("doc_a"), col("sh"))
      .join(ex.select(col("doc_id").as("doc_b"), col("sh")), Seq("sh"))
      .filter(col("doc_a") =!= col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("nsh").as("na")), "doc_a")
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") / col("na")).as("cont"))
      .filter(col("cont") >= threshold)
      .groupBy(col("doc_a").as("contained"))
      .agg(max(struct(col("cont"), (-col("doc_b")).as("nb")))
        .as("best"))
      .select(col("contained"), (-col("best.nb")).as("container"),
        round(col("best.cont"), 6).as("containment"))
  }

  /** Fixed affine family for the oracle-restatable MinHash below:
    * h_j(x) = (A(j)·x + B(j)) mod P over 40-bit poly-hash values, with
    * P the largest prime < 2^40 and A(j) < 2^22 — every product stays
    * under 2^62, so both engines evaluate the same overflow-free BIGINT
    * arithmetic. Constants are fixed (seeded once, hardcoded) so runs
    * and the oracle are byte-reproducible.
    */
  private[graft] val MhP = 1099511627689L
  private[graft] val MhA = Seq(3068475L, 1426747L, 3242303L, 2526773L,
    2192895L, 3084929L, 142135L, 1516249L, 3534771L, 2125783L, 3351925L,
    3622633L, 2688635L, 2406763L, 246277L, 3356151L)
  private[graft] val MhB = Seq(474956710717L, 569926007580L, 112175910369L,
    1027160151963L, 1092029909505L, 219212213410L, 747899766013L,
    21032708389L, 189963241189L, 762949772444L, 1085129535079L,
    238379954882L, 1088602824167L, 667375464682L, 672226259792L,
    55605038449L)

  /** MinHash estimator-error audit (W228): for every document pair with
    * exact shingle Jaccard ≥ `threshold`, the signature-agreement
    * estimate (fraction of agreeing positions over `MhA.length`
    * permutations) next to the exact value it estimates — the
    * calibration table that tells you whether the production LSH tier's
    * band thresholds actually sit where the S-curve math says they do
    * (the [[minhashPairs]] pipeline's ship/no-ship number, exactly as
    * `ann_recall` gates the IVF index). The production signature uses
    * xxhash64 (not SQL-restatable); this audit runs the same
    * construction over the 40-bit poly hash with the fixed affine
    * family above, so DuckDB replays every bit. Pair universe comes
    * from the shingle-key equality join (shuffle on shingles, never on
    * pairs); signatures ride the same cached shingle frame, so the
    * corpus tokenizes once.
    */
  def minhashEstError(s: SparkSession, dir: String,
                      threshold: Double = 0.05): DataFrame = {
    val k = MhA.length
    val docSh = docShingles(s, dir, 3).persist()
    CacheScope.register(docSh) // sizes + join sides + signatures read it
    val sizes = docSh.select(col("doc_id"), size(col("shs")).as("nsh"))
    val ex = docSh.select(col("doc_id"), explode(col("shs")).as("sh"))
    val inter = ex.select(col("doc_id").as("doc_a"), col("sh"))
      .join(ex.select(col("doc_id").as("doc_b"), col("sh")), Seq("sh"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("inter"))
    val pairs = inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("nsh").as("na")),
        "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("nsh").as("nb")),
        "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (col("inter") / (col("na") + col("nb") - col("inter")))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
    val sig = docSh
      .select(col("doc_id"), polyHashArray(col("shs")).as("hs"))
      .select(col("doc_id"), array((0 until k).map { j =>
        array_min(transform(col("hs"),
          h => (h * lit(MhA(j)) + lit(MhB(j))) % lit(MhP)))
      }: _*).as("sig"))
    pairs
      .join(sig.select(col("doc_id").as("doc_a"), col("sig").as("sa")),
        "doc_a")
      .join(sig.select(col("doc_id").as("doc_b"), col("sig").as("sb")),
        "doc_b")
      .select(col("doc_a"), col("doc_b"), col("jaccard"),
        aggregate(zip_with(col("sa"), col("sb"),
          (x, y) => when(x === y, 1L).otherwise(0L)),
          lit(0L), (acc, v) => acc + v).as("agree"))
      .select(col("doc_a"), col("doc_b"),
        Events.q(col("jaccard"), 6).as("exact_jaccard"),
        col("agree"),
        Events.q(col("agree").cast("double") / k, 6).as("est_jaccard"),
        Events.q(col("agree").cast("double") / k - Events.q(col("jaccard"), 6),
          6).as("est_error"))
      .orderBy("doc_a", "doc_b")
  }

  /** Dedup savings report (W229): per source, the token mass the
    * near-dup pass actually removes — documents, tokens, and the
    * share of the source's tokens sitting in non-canonical cluster
    * members. This is the number that justifies (or kills) running
    * dedup on a new source: a 0.2% savings on a 10 TB source is not
    * worth the pass. Composes [[jaccardPairs]] → [[assignCanonical]]
    * (min-id survivorship, same contract as `dedup_assign`) with one
    * tokenize scan; the per-source rollup is a tiny aggregate over
    * the already-shuffled (doc, component) table.
    */
  def dedupSavings(s: SparkSession, dir: String,
                   threshold: Double = 0.8): DataFrame = {
    val canon = assignCanonical(s, dir, jaccardPairs(s, dir, threshold))
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        size(tokenize(col("text"))).cast("long").as("n"))
    toks.join(canon, "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n")).as("total_tokens"),
        sum(when(col("doc_id") =!= col("canonical_id"), 1L).otherwise(0L))
          .as("removed_docs"),
        sum(when(col("doc_id") =!= col("canonical_id"), col("n"))
          .otherwise(0L)).as("removed_tokens"))
      .select(col("source"), col("n_docs"), col("total_tokens"),
        col("removed_docs"), col("removed_tokens"),
        when(col("total_tokens") > 0,
          Events.q(col("removed_tokens").cast("double") /
            col("total_tokens"), 6)).otherwise(lit(0.0)).as("savings"))
      .orderBy("source")
  }

  /** Dedup bias audit (W234): does near-dup removal fall evenly across
    * quality, or does it preferentially delete one end? Documents are
    * cut into quality terciles (rank order on the surfaced quality
    * score, doc_id tiebreak) and each band reports its removal rate
    * and the lift against the corpus-wide rate — lift ≫ 1 on the
    * low-quality band is the healthy outcome (spam templates
    * duplicate); lift ≫ 1 on the HIGH band means the dedup threshold
    * is eating legitimate popular content. The tercile cut is an exact
    * global rank computed scale-safe (round-8, [[Ranks.ranked]]):
    * approx-percentile range buckets + a bucket-PARTITIONED window —
    * no single-partition sort anywhere — then [[Ranks.ntileFromRank]]
    * restates NTILE(3) from the rank, bit-identical to the windowed
    * NTILE (parity spec-pinned in Round8OpsSpec).
    */
  def dedupBias(s: SparkSession, dir: String,
                threshold: Double = 0.8): DataFrame = {
    val canon = assignCanonical(s, dir, jaccardPairs(s, dir, threshold))
    val qual = TextStats.quality(s, dir).select(col("doc_id"), col("quality"))
    val base = qual.join(canon, "doc_id")
      .select(col("doc_id"), col("quality"),
        (col("doc_id") =!= col("canonical_id")).as("removed"))
    val cnt = base.agg(count(lit(1)).as("__g_n")) // reads Ranks' cache
    val g = Ranks.ranked(base, "quality", "doc_id", "__g_r")
      .crossJoin(broadcast(cnt))
      .withColumn("band",
        Ranks.ntileFromRank(col("__g_r"), col("__g_n"), 3).cast("int"))
      .groupBy("band")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("removed"), 1L).otherwise(0L)).as("removed_docs"))
      .localCheckpoint() // the corpus-wide rate below re-reads it
    g.crossJoin(broadcast(g.agg(sum(col("n_docs")).as("_n"),
        sum(col("removed_docs")).as("_r"))))
      .select(col("band"), col("n_docs"), col("removed_docs"),
        Events.q(col("removed_docs").cast("double") / col("n_docs"), 6)
          .as("removal_rate"),
        when(col("_r") > 0,
          Events.q((col("removed_docs").cast("double") / col("n_docs")) /
            (col("_r").cast("double") / col("_n")), 6))
          .otherwise(lit(0.0)).as("lift"))
      .orderBy("band")
  }

  /** Dedup threshold sweep: duplicate-pair and affected-document
    * counts at Jaccard cutoffs 0.5…0.9 from ONE shingle self-join —
    * the tuning table consulted before fixing the production dedup
    * threshold (too low eats distinct documents, too high leaves
    * near-dups in). Every threshold test is the cross-multiplied
    * integer `10·inter ≥ t·(na+nb−inter)` — no float compare anywhere
    * — and all five cutoffs re-read the one cached intersect table, so
    * the sweep costs one candidate-generation pass regardless of how
    * many thresholds are probed. Zero-pair thresholds still surface
    * (count over an empty frame), so the table is always complete.
    */
  def dedupThresholdSweep(s: SparkSession, dir: String,
                          n: Int = 3): DataFrame = {
    val docSh = docShingles(s, dir, n).persist()
    CacheScope.register(docSh)
    val sizes = docSh.select(col("doc_id"), size(col("shs")).as("nsh"))
    val ex = docSh.select(col("doc_id"), explode(col("shs")).as("sh"))
    val inter = ex.select(col("doc_id").as("doc_a"), col("sh"))
      .join(ex.select(col("doc_id").as("doc_b"), col("sh")), Seq("sh"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("doc_id").as("doc_a"),
        col("nsh").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"),
        col("nsh").as("nb")), "doc_b")
      .persist()
    CacheScope.register(inter) // eager: five threshold subtrees scan it
    (5 to 9).map { t =>
      val hit = inter.filter(col("inter") * 10 >=
        lit(t.toLong) * (col("na") + col("nb") - col("inter")))
      val pairs = hit.agg(count(lit(1)).as("n_pairs"))
      val docs = hit
        .select(explode(array(col("doc_a"), col("doc_b"))).as("d"))
        .agg(countDistinct(col("d")).as("n_docs"))
      pairs.crossJoin(docs)
        .select(lit(t.toDouble / 10).as("threshold"),
          col("n_pairs"), col("n_docs"))
    }.reduce(_ unionAll _).orderBy("threshold")
  }

  /** EM-estimated Fellegi–Sunter parameters (W311) — the estimation
    * step [[linkageWeights]] deliberately froze: fit the match
    * prevalence p and per-field agreement rates m_j = P(agree|match),
    * u_j = P(agree|non-match) from the blocked candidate pairs
    * themselves, via two unrolled EM iterations over the 2³
    * AGREEMENT-PATTERN table (brand, type, adjective — conditional
    * independence, the standard FS model). The corpus-bound work is
    * one blocked self-join reduced to 8 exact pattern counts;
    * EVERYTHING the EM touches after that is an 8-row spine, so the
    * iteration count is free and there is no driver-side state.
    * Determinism: each E-step responsibility w_g (a fixed double
    * chain over the previous round's parameters) is floor-quantized
    * to a 1e-9 LONG weight, so every M-step sum is an order-free
    * exact DECIMAL(38) sum and each new parameter is ONE division of
    * exact integers — transcendental-free end to end.
    */
  def fsEmWeights(s: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val p = Tables.part(s, dir).select(
      col("p_partkey").as("k"),
      element_at(split(col("p_name"), " "), 1).as("adj"),
      element_at(split(col("p_name"), " "), -1).as("noun"),
      col("p_brand").as("b"), col("p_type").as("t"),
      floor(col("p_size") / 5).cast("long").as("band"))
    def side(suf: String) = p.select(
      col("k").as(s"k$suf"), col("adj").as(s"adj$suf"), col("noun"),
      col("b").as(s"b$suf"), col("t").as(s"t$suf"), col("band"))
    val pat0 = side("1").join(side("2"), Seq("noun", "band"))
      .filter(col("k1") < col("k2"))
      .select(((col("b1") === col("b2")).cast("long") * 4 +
        (col("t1") === col("t2")).cast("long") * 2 +
        (col("adj1") === col("adj2")).cast("long")).as("g"))
      .groupBy("g").agg(count(lit(1)).as("n"))
    // dense 8-pattern spine: EM sums must see absent patterns as 0
    val pd = s.range(8).toDF("g")
      .join(pat0, Seq("g"), "left").na.fill(0L, Seq("n"))
      .select(col("g"), col("n"),
        shiftright(col("g"), 2).bitwiseAND(lit(1L)).as("g1"),
        shiftright(col("g"), 1).bitwiseAND(lit(1L)).as("g2"),
        col("g").bitwiseAND(lit(1L)).as("g3"))
      .localCheckpoint() // 8 rows; both EM rounds re-read it
    // one EM round: pattern spine + current params (columns p, m1..3,
    // u1..3 on every row) → 1-row next params
    def emRound(df: DataFrame): DataFrame = {
      def lik(pre: String) =
        when(col("g1") === 1, col(s"${pre}1"))
          .otherwise(lit(1.0) - col(s"${pre}1")) *
        when(col("g2") === 1, col(s"${pre}2"))
          .otherwise(lit(1.0) - col(s"${pre}2")) *
        when(col("g3") === 1, col(s"${pre}3"))
          .otherwise(lit(1.0) - col(s"${pre}3"))
      val pm = col("p") * lik("m")
      val pu = (lit(1.0) - col("p")) * lik("u")
      val wq = floor(pm / (pm + pu) * lit(1e9) + lit(0.5)).cast("long")
      df.select(col("n"), col("g1"), col("g2"), col("g3"),
          wq.as("wq"), (lit(1000000000L) - wq).as("vq"))
        .agg(sum(col("n")).as("nn"),
          sum(col("n").cast(dec) * col("wq")).as("sw"),
          sum(col("n").cast(dec) * col("wq") * col("g1")).as("sw1"),
          sum(col("n").cast(dec) * col("wq") * col("g2")).as("sw2"),
          sum(col("n").cast(dec) * col("wq") * col("g3")).as("sw3"),
          sum(col("n").cast(dec) * col("vq")).as("su"),
          sum(col("n").cast(dec) * col("vq") * col("g1")).as("su1"),
          sum(col("n").cast(dec) * col("vq") * col("g2")).as("su2"),
          sum(col("n").cast(dec) * col("vq") * col("g3")).as("su3"))
        .select(col("nn"),
          (col("sw").cast("double") /
            (col("nn").cast("double") * lit(1e9))).as("p"),
          (col("sw1").cast("double") / col("sw").cast("double")).as("m1"),
          (col("sw2").cast("double") / col("sw").cast("double")).as("m2"),
          (col("sw3").cast("double") / col("sw").cast("double")).as("m3"),
          (col("su1").cast("double") / col("su").cast("double")).as("u1"),
          (col("su2").cast("double") / col("su").cast("double")).as("u2"),
          (col("su3").cast("double") / col("su").cast("double")).as("u3"))
    }
    val init = pd
      .withColumn("p", lit(0.1))
      .withColumn("m1", lit(0.9)).withColumn("m2", lit(0.9))
      .withColumn("m3", lit(0.9))
      .withColumn("u1", lit(0.1)).withColumn("u2", lit(0.1))
      .withColumn("u3", lit(0.1))
    val p1 = emRound(init)
    val p2 = emRound(pd.crossJoin(broadcast(p1.drop("nn"))))
    import graft.operators.Events.{q => qz}
    p2.select(col("nn").as("n_pairs"),
      qz(col("p"), 6).as("p_match"),
      qz(col("m1"), 6).as("m_brand"), qz(col("m2"), 6).as("m_type"),
      qz(col("m3"), 6).as("m_adj"),
      qz(col("u1"), 6).as("u_brand"), qz(col("u2"), 6).as("u_type"),
      qz(col("u3"), 6).as("u_adj"))
  }

  /** Blocking-scheme quality audit (W399): before running any
    * pairwise linkage at 100 TB you pick a BLOCKING KEY, and this op
    * scores one (first token × 20-char length band) on the two
    * numbers that matter — REDUCTION RATIO (1 − candidate/total
    * pairs: how much work the block saves) and PAIRS COMPLETENESS
    * (what share of true near-dup pairs, per [[jaccardPairs]] at
    * 0.8, the block still co-locates). RR without PC is cheating
    * (empty blocks have RR 1); PC without RR is the all-pairs join.
    * Candidate counts are ΣC(block,2) from one key-keyed agg — the
    * blocks are never materialized as pairs; truth pairs join their
    * two block keys and compare. Every statistic is an exact LONG;
    * the two ratios divide once. Scale: truth generation is the
    * shingle-keyed jaccardPairs plan; everything else is key-agg.
    */
  def blockingQuality(s: SparkSession, dir: String): DataFrame = {
    val keys = Tables.documents(s, dir)
      .select(col("doc_id"), concat_ws("|",
        element_at(tokenize(col("text")), 1),
        expr("n_chars div 20").cast("string")).as("bk"))
      .persist()
    CacheScope.register(keys) // eager: candidate agg + truth join
    val n = keys.count()
    val cand = keys.groupBy("bk").agg(count(lit(1)).as("cnt"))
      .select(expr("cnt * (cnt - 1) div 2").as("cp"))
      .agg(coalesce(sum(col("cp")), lit(0L)).as("n_cand"))
    val truth = jaccardPairs(s, dir, 0.8)
      .join(keys.select(col("doc_id").as("doc_a"), col("bk").as("ka")),
        "doc_a")
      .join(keys.select(col("doc_id").as("doc_b"), col("bk").as("kb")),
        "doc_b")
      .agg(count(lit(1)).as("n_truth"),
        coalesce(sum((col("ka") === col("kb")).cast("long")), lit(0L))
          .as("n_matched"))
    val totPairs = n * (n - 1) / 2
    cand.crossJoin(truth)
      .select(lit(n).as("n_docs"), col("n_truth"), col("n_cand"),
        col("n_matched"),
        when(col("n_truth") > 0,
          graft.operators.Events.q(col("n_matched").cast("double") /
            col("n_truth").cast("double"), 6)).otherwise(lit(1.0))
          .as("pairs_completeness"),
        graft.operators.Events.q(lit(1.0) -
          col("n_cand").cast("double") / lit(totPairs.toDouble), 6)
          .as("reduction_ratio"))
  }
  /** Near-dup detector agreement audit (W421): the pair-set overlap
    * between the exact shingle-Jaccard detector ([[jaccardPairs]] at
    * 0.8) and the SimHash bank detector ([[simhashPairs]]) — the
    * "would switching detectors change the corpus?" number that a
    * single detector's own precision/recall can't answer. One
    * full-outer join on the canonical (doc_a, doc_b) key; exact
    * counts of both/only-A/only-B and their Jaccard, one division.
    */
  def detectorAgreement(s: SparkSession, dir: String): DataFrame = {
    val a = jaccardPairs(s, dir, 0.8).select("doc_a", "doc_b")
      .withColumn("ina", lit(1L))
    val b = simhashPairs(s, dir).select("doc_a", "doc_b")
      .withColumn("inb", lit(1L))
    val j = a.join(b, Seq("doc_a", "doc_b"), "full_outer")
      .select(coalesce(col("ina"), lit(0L)).as("ina"),
        coalesce(col("inb"), lit(0L)).as("inb"))
    j.agg(sum(col("ina") * col("inb")).as("n_both"),
        sum(col("ina") * (lit(1L) - col("inb"))).as("n_only_jaccard"),
        sum((lit(1L) - col("ina")) * col("inb")).as("n_only_simhash"),
        count(lit(1)).as("n_union"))
      .select(col("n_both"), col("n_only_jaccard"),
        col("n_only_simhash"),
        when(col("n_union") > 0,
          graft.operators.Events.q(col("n_both").cast("double") /
            col("n_union").cast("double"), 6)).otherwise(lit(1.0))
          .as("agreement"))
  }

  /** Capture–recapture estimate of the TRUE near-dup pair population
    * (W437): treat the exact-Jaccard and SimHash detectors as two
    * independent "captures" of the same underlying duplicate-pair
    * set and apply the bias-corrected Chapman estimator
    * N̂ = (n₁+1)(n₂+1)/(m+1) − 1 — the ecology workhorse, repurposed
    * to answer the question [[detectorAgreement]] can't: "how many
    * near-dup pairs do BOTH detectors MISS?" (est_missed = N̂ −
    * observed union). Counts are exact integers; the estimator is
    * one division on a 1e-2 grid. Independence is optimistic when
    * the detectors share failure modes (both shingle-based misses
    * correlate) — surfaced as a floor, not a census, per the
    * scaladoc contract. Scale: the two pair pipelines + one
    * full-outer pair join, all LSH-bucketed upstream.
    */
  def captureRecapture(s: SparkSession, dir: String): DataFrame = {
    val a = jaccardPairs(s, dir, 0.8).select("doc_a", "doc_b")
      .withColumn("ina", lit(1L))
    val b = simhashPairs(s, dir).select("doc_a", "doc_b")
      .withColumn("inb", lit(1L))
    val j = a.join(b, Seq("doc_a", "doc_b"), "full_outer")
      .select(coalesce(col("ina"), lit(0L)).as("ina"),
        coalesce(col("inb"), lit(0L)).as("inb"))
    val g = j.agg(sum(col("ina")).as("n1"), sum(col("inb")).as("n2"),
      sum(col("ina") * col("inb")).as("m"),
      count(lit(1)).as("n_union"))
    val chap = (col("n1").cast("double") + 1) *
      (col("n2").cast("double") + 1) /
      (col("m").cast("double") + 1) - 1
    g.select(col("n1").as("n_jaccard"), col("n2").as("n_simhash"),
      col("m").as("n_both"), col("n_union"),
      graft.operators.Events.q(chap, 2).as("chapman_est"),
      graft.operators.Events.q(
        greatest(lit(0.0), chap - col("n_union").cast("double")), 2)
        .as("est_missed"))
  }

  /** Source-pair duplication matrix (W461): the exact-Jaccard
    * near-dup pairs bucketed by their documents' (source, source)
    * cell — WHICH sources duplicate each other? Within-source cells
    * mean a crawler re-fetching itself; cross-source cells mean
    * syndication, and they decide whether per-source dedup
    * ([[incrementalDedup]]'s batch-vs-corpus shape) suffices or a
    * global pass is required. Cells key on the sorted source pair so
    * (a,b) and (b,a) merge; counts are exact, the share divides once
    * by the total. Scale: the pair pipeline + two broadcast-able
    * doc-source joins + one tiny cell agg.
    */
  def dedupSourceMatrix(s: SparkSession, dir: String): DataFrame = {
    val pairs = jaccardPairs(s, dir, 0.8).select("doc_a", "doc_b")
    val src = Tables.documents(s, dir).select(col("doc_id"),
      col("source"))
    val cells = pairs
      .join(src.select(col("doc_id").as("doc_a"),
        col("source").as("sa0")), "doc_a")
      .join(src.select(col("doc_id").as("doc_b"),
        col("source").as("sb0")), "doc_b")
      .select(least(col("sa0"), col("sb0")).as("src_a"),
        greatest(col("sa0"), col("sb0")).as("src_b"))
      .groupBy("src_a", "src_b").agg(count(lit(1)).as("n_pairs"))
      .persist()
    graft.CacheScope.register(cells) // eager: total + the share scan
    val tot = cells.agg(sum(col("n_pairs")).as("tot"))
    cells.crossJoin(broadcast(tot))
      .select(col("src_a"), col("src_b"), col("n_pairs"),
        (col("src_a") === col("src_b")).cast("long")
          .as("within_source"),
        graft.operators.Events.q(col("n_pairs").cast("double") /
          col("tot").cast("double"), 6).as("share"))
      .orderBy(col("n_pairs").desc, col("src_a"), col("src_b"))
  }

  /** Dup-cluster shape audit (W495): does the near-dup pair set's
    * transitive closure CHAIN (A~B~C with A≁C — the classic
    * threshold-too-low pathology that merges unrelated documents
    * through bridges) or form honest cliques? Per component: node
    * count, edge count, density 2e/n(n−1) as an EXACT integer on the
    * 1e-9 grid (integral division — no float), clique and tree flags
    * by integer equalities. Components ride the engine's
    * [[graft.operators.Graph.connectedComponents]]; the oracle's
    * recursive walk only needs label CONSISTENCY, never label parity,
    * because only per-cluster aggregates surface. One summary row —
    * the go/no-go a dedup rollout reads before trusting
    * `assignCanonical` at a given threshold.
    */
  def clusterDensityAudit(s: SparkSession, dir: String,
                          threshold: Double = 0.8): DataFrame = {
    import graft.operators.Events.q
    val pairs = jaccardPairs(s, dir, threshold)
      .select("doc_a", "doc_b").persist()
    CacheScope.register(pairs)
    val comps = Graph.connectedComponents(
      pairs.select(col("doc_a").as("src"), col("doc_b").as("dst")))
    val nodes = comps.groupBy("comp").agg(count(lit(1)).as("n"))
    val edges = pairs
      .join(comps.select(col("id").as("doc_a"), col("comp")), "doc_a")
      .groupBy("comp").agg(count(lit(1)).as("e"))
    // a CHAIN is a tree (e = n−1) whose every node has degree ≤ 2 —
    // without the degree cap a star (one hub near-dup of many mutually
    // dissimilar docs) is also a tree and would be miscounted as the
    // threshold-chaining pathology this column exists to flag
    val maxdeg = pairs.select(col("doc_a").as("id"))
      .unionAll(pairs.select(col("doc_b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
      .join(comps, "id")
      .groupBy("comp").agg(max(col("deg")).as("md"))
    val cl = nodes.join(edges, Seq("comp")).join(maxdeg, Seq("comp"))
      .withColumn("d9", expr("(2000000000 * e) div (n * (n - 1))"))
    cl.agg(count(lit(1)).as("k"),
        coalesce(sum(col("n")), lit(0L)).as("n_dup_docs"),
        coalesce(max(col("n")), lit(0L)).as("max_cluster_size"),
        coalesce(sum((col("e") * 2 === col("n") * (col("n") - 1))
          .cast("long")), lit(0L)).as("n_cliques"),
        coalesce(sum((col("e") === col("n") - 1 && col("n") >= 3 &&
          col("md") <= 2).cast("long")), lit(0L)).as("n_tree_chains"),
        coalesce(sum(col("d9")), lit(0L)).as("sd9"))
      .select(col("k").as("n_clusters"), col("n_dup_docs"),
        col("max_cluster_size"), col("n_cliques"), col("n_tree_chains"),
        when(col("k") > 0, q(col("sd9").cast("double") /
          col("k").cast("double") / lit(1e9), 6)).otherwise(lit(0.0))
          .as("mean_density"))
  }

  /** MinHash-LSH banding sweep (W494): candidate volume, recall, and
    * candidate precision at band counts 4/8/16 over the SAME 16-hash
    * oracle-replicable signature ([[minhashEstError]]'s poly-hash
    * permutations) — the dedup-side tuning table
    * ([[graft.operators.Similarity.nprobeRecallSweep]]'s twin): more
    * bands ⇒ higher recall AND more candidate pairs to verify; the
    * operating point is the knee. One signature pass serves every
    * config (band keys are signature slices serialized to strings, so
    * the bucket join and the oracle replay byte-identically); ground
    * truth is the exact shingle-join pair set at the cross-multiplied
    * integer threshold (100·|∩| ≥ thr·|∪| — division-free). At corpus
    * scale the sweep runs on a document sample, like every tuning
    * table.
    */
  def lshBandSweep(s: SparkSession, dir: String, threshold: Double = 0.8,
                   n: Int = 3,
                   bandCounts: Seq[Int] = Seq(4, 8, 16)): DataFrame = {
    import graft.operators.Events.q
    val k = MhA.length
    val thrN = math.round(threshold * 100)
    val docSh = docShingles(s, dir, n).persist()
    CacheScope.register(docSh)
    val sizes = docSh.select(col("doc_id"), size(col("shs")).as("nsh"))
    val ex = docSh.select(col("doc_id"), explode(col("shs")).as("sh"))
      .persist()
    CacheScope.register(ex) // eager: df, prefix, and both verify joins
    // ground truth via the SAME lossless PPJoin prefix filter as
    // [[jaccardPrefixFilter]] (W172): each doc indexes only its
    // |s| − ⌈t·|s|⌉ + 1 globally-rarest shingles, which provably
    // covers every pair at Jaccard ≥ t — identical truth set to the
    // former full shared-shingle self-join, without that join's
    // quadratic blow-up on hot boilerplate shingles (VERDICT r6 #5).
    val tdf = ex.groupBy("sh").agg(count(lit(1)).as("df"))
    // NOT cached (r12 revert of the r11 persist): tprefix feeds both
    // truth self-join sides, but the persist regressed lsh_band_sweep
    // on EVERY measurement (driver 8.7→30.1 s wall at local[32], the
    // builder's own full board 8.5→10.6 s wall / 173→188 s task) — this
    // query already carries docSh+ex+truth+sig+cand caches, and one
    // more materialized relation pushes it past the memory/GC knee at
    // 32 concurrent tasks (VERDICT r11 #1). Recomputing the rank
    // window twice is cheaper under cold full-board conditions.
    val tprefix = ex.join(tdf, "sh")
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy(col("df"), col("sh"))))
      .join(sizes, "doc_id")
      .filter(col("pos") <=
        col("nsh") - ceil(round(lit(threshold) * col("nsh"), 9)) + 1)
      .select("doc_id", "sh")
    val tcand = tprefix.select(col("doc_id").as("doc_a"), col("sh"))
      .join(tprefix.select(col("doc_id").as("doc_b"), col("sh")), "sh")
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    val truth = tcand
      .join(ex.select(col("doc_id").as("doc_a"), col("sh")), "doc_a")
      .join(ex.select(col("doc_id").as("doc_b"), col("sh")),
        Seq("doc_b", "sh"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("nsh").as("na")),
        "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("nsh").as("nb")),
        "doc_b")
      .filter(col("inter") * lit(100L) >=
        (col("na") + col("nb") - col("inter")) * lit(thrN))
      .select("doc_a", "doc_b")
      .persist()
    CacheScope.register(truth)
    val sig = docSh
      .select(col("doc_id"), polyHashArray(col("shs")).as("hs"))
      .select(col("doc_id"), array((0 until k).map { j =>
        array_min(transform(col("hs"),
          h => (h * lit(MhA(j)) + lit(MhB(j))) % lit(MhP)))
      }: _*).as("sig"))
      .persist()
    CacheScope.register(sig)
    val banded = bandCounts.map { bc =>
      val r = k / bc
      sig.select(lit(bc.toLong).as("bands"), col("doc_id"),
        explode(expr(
          s"""transform(sequence(0, ${bc - 1}), b -> struct(b AS band,
              array_join(transform(slice(sig, b * $r + 1, $r),
                x -> cast(x AS string)), '_') AS key))""")).as("t"))
        .select(col("bands"), col("doc_id"), col("t.band"), col("t.key"))
    }.reduce(_ unionAll _)
    val cand = banded
      .select(col("bands"), col("band"), col("key"),
        col("doc_id").as("doc_a"))
      .join(banded.select(col("bands"), col("band"), col("key"),
        col("doc_id").as("doc_b")), Seq("bands", "band", "key"))
      .filter(col("doc_a") < col("doc_b"))
      .select("bands", "doc_a", "doc_b")
      .distinct()
      .persist()
    CacheScope.register(cand)
    val nTrue = truth.count()
    val det = cand.join(truth, Seq("doc_a", "doc_b"))
      .groupBy("bands").agg(count(lit(1)).as("n_detected"))
    cand.groupBy("bands").agg(count(lit(1)).as("n_candidates"))
      .join(det, Seq("bands"), "left")
      .select(col("bands"), expr(s"$k div bands").as("rows_per_band"),
        col("n_candidates"), lit(nTrue).as("n_true"),
        coalesce(col("n_detected"), lit(0L)).as("n_detected"),
        when(lit(nTrue) > 0,
          q(coalesce(col("n_detected"), lit(0L)).cast("double") /
            lit(nTrue.toDouble), 6)).otherwise(lit(0.0)).as("recall"),
        when(col("n_candidates") > 0,
          q(coalesce(col("n_detected"), lit(0L)).cast("double") /
            col("n_candidates").cast("double"), 6)).otherwise(lit(0.0))
          .as("cand_precision"))
      .orderBy("bands")
  }

  /** Asymmetric containment pairs (W490): |A∩B| / min(|A|,|B|) over
    * the MinHash-LSH candidate set — the dedup signal Jaccard
    * UNDERSTATES when one document quotes or wraps another (a page
    * fully containing a short doc can sit at Jaccard 0.1 but
    * containment 1.0). Candidates come from the same banded-signature
    * join as [[minhashPairs]] (sub-quadratic; a short-in-long pair
    * with LOW Jaccard can evade the bands — documented recall bound,
    * same as every LSH consumer, and the oracle's exact all-pairs
    * check pins the fixture's recall at 1). Counts are exact
    * integers; the score is one division; `subset_flag` marks full
    * containment by an integer equality.
    */
  def docContainment(s: SparkSession, dir: String,
                     threshold: Double = 0.9, n: Int = 3,
                     numHashes: Int = 64, bands: Int = 16): DataFrame = {
    val (docSh, banded) =
      bandedSignatures(TextStats.tokenized(s, dir), n, numHashes, bands)
    val l = banded.select(col("doc_id").as("doc_a"), col("band"),
      col("bh"))
    val r = banded.select(col("doc_id").as("doc_b"), col("band"),
      col("bh"))
    val cand = l.join(r, Seq("band", "bh"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()
    cand
      .join(docSh.select(col("doc_id").as("doc_a"),
        col("shs").as("sa")), "doc_a")
      .join(docSh.select(col("doc_id").as("doc_b"),
        col("shs").as("sb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("sa"), col("sb"))).cast("long")
          .as("inter"),
        least(size(col("sa")), size(col("sb"))).cast("long")
          .as("min_sz"))
      .withColumn("containment",
        graft.operators.Events.q(col("inter").cast("double") /
          col("min_sz").cast("double"), 6))
      .filter(col("containment") >= threshold)
      .withColumn("subset_flag",
        (col("inter") === col("min_sz")).cast("long"))
      .select("doc_a", "doc_b", "inter", "min_sz", "containment",
        "subset_flag")
      .orderBy("doc_a", "doc_b")
  }

  /** Residual-duplication audit (W502): after canonical assignment at
    * the production threshold `tHi`, how much near-dup mass SURVIVES
    * just under it? Counts exact-Jaccard pairs at `tLo` whose BOTH
    * endpoints are survivors — pairs at ≥ tHi can't qualify (their
    * endpoints share a cluster, so at most one survives), so every
    * counted pair is genuinely sub-threshold leftover linking two
    * distinct clusters. A high residual rate says the threshold sits
    * on a mass ridge and dedup should drop (or the pair stage should
    * re-run incrementally). Both pair passes are the prefix-filtered /
    * shingle-keyed joins — never all-pairs; the survivor filter is one
    * semi-join.
    *
    * Cost note (VERDICT r7 #4): within ONE invocation nothing runs
    * twice — the tLo pair pass is persisted and re-thresholded for tHi,
    * and the components loop runs once on the tHi edges. The remaining
    * ~6 s standalone at sf0.1 is the audit's irreducible work: the tLo
    * prefix is LONGER than a production tHi pass's (lower threshold ⇒
    * weaker filter ⇒ more candidates), which is the price of measuring
    * sub-threshold mass at all. Cross-QUERY reuse of `dedup_assign`'s
    * components (when both run in one session) is deliberately not
    * memoized: `CacheScope.release` unpersists every tracked frame
    * between queries — the library's bounded-storage contract (cached
    * bytes ≤ one query's working set on a long-lived driver) — so a
    * memo would hand later queries a released, silently-recomputing
    * handle. A caller that wants the sharing passes its own persisted
    * pairs frame through [[assignCanonicalDocs]] explicitly.
    */
  def residualDupAudit(s: SparkSession, dir: String, tHi: Double = 0.8,
                       tLo: Double = 0.7, n: Int = 3): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"))
    // ONE prefix-filtered pass at the lower threshold serves both
    // classes: tLo's lossless prefix is a superset of tHi's, so the
    // tHi pairs are exactly the tLo pairs re-thresholded (on the
    // UNROUNDED jaccard, matching what a dedicated tHi pass computes)
    val pairsLo = prefixPairsRaw(s, dir, tLo, n).persist()
    CacheScope.register(pairsLo)
    val hi = pairsLo.filter(col("jaccard") >= tHi)
      .select("doc_a", "doc_b")
    val assign = assignCanonicalDocs(docs, hi).persist()
    CacheScope.register(assign) // eager: totals + the survivor filter
    val surv = assign.filter(col("doc_id") === col("canonical_id"))
      .select(col("doc_id"))
    val resid = pairsLo
      .join(surv.select(col("doc_id").as("doc_a")), "doc_a")
      .join(surv.select(col("doc_id").as("doc_b")), "doc_b")
      .agg(count(lit(1)).as("n_residual_pairs"))
    val totals = assign.agg(count(lit(1)).as("n_docs"),
      sum((col("doc_id") === col("canonical_id")).cast("long"))
        .as("n_survivors"))
    totals.crossJoin(resid)
      .select(col("n_docs"), col("n_survivors"), col("n_residual_pairs"),
        graft.operators.Events.q(col("n_residual_pairs").cast("double") *
          lit(1000.0) / col("n_survivors").cast("double"), 6)
          .as("residual_per_1k"))
  }

  /** Survivorship-policy comparison (W505): over real dup clusters
    * (size ≥ 2), how often does min-id survivorship
    * ([[assignCanonical]]) pick the same document as quality-argmax
    * survivorship ([[bestSurvivor]]), and how much mean quality does
    * the argmax policy buy? The one-row readout that decides whether
    * the cheaper min-id policy is good enough for a corpus (agree_share
    * near 1 / gain near 0 ⇒ keep min-id and skip the quality join at
    * dedup time). Per-cluster argmax/argmin ride `min_by` in ONE
    * cluster-keyed agg; quality quantizes to the 1e-6 LONG grid before
    * the gain sum.
    */
  def dedupPolicyCompare(s: SparkSession, dir: String,
                         threshold: Double = 0.8): DataFrame = {
    import graft.operators.Events.q
    val assigned = assignCanonical(s, dir, jaccardPairs(s, dir, threshold))
    val qual = TextStats.quality(s, dir).select(col("doc_id"),
      floor(col("quality") * lit(1e6) + lit(0.5)).cast("long").as("q6"))
    val withQ = assigned.join(qual, Seq("doc_id"), "left")
      .select(col("doc_id"), col("canonical_id"),
        coalesce(col("q6"), lit(0L)).as("q6"))
    val per = withQ.groupBy("canonical_id")
      .agg(count(lit(1)).as("n"),
        min_by(col("doc_id"),
          struct((-col("q6")).as("nq"), col("doc_id"))).as("keep_id"),
        min_by(col("q6"),
          struct((-col("q6")).as("nq"), col("doc_id"))).as("bq6"),
        min_by(col("q6"), col("doc_id")).as("mq6"))
    per.filter(col("n") >= 2)
      .agg(count(lit(1)).as("n_clusters"),
        coalesce(sum((col("keep_id") === col("canonical_id"))
          .cast("long")), lit(0L)).as("n_agree"),
        coalesce(sum(col("bq6") - col("mq6")), lit(0L)).as("gain6"))
      .select(col("n_clusters"), col("n_agree"),
        when(col("n_clusters") > 0,
          q(col("n_agree").cast("double") /
            col("n_clusters").cast("double"), 6)).otherwise(lit(0.0))
          .as("agree_share"),
        when(col("n_clusters") > 0,
          q(col("gain6").cast("double") /
            col("n_clusters").cast("double") / lit(1e6), 6))
          .otherwise(lit(0.0)).as("mean_q_gain"))
  }

  /** MinHash signature-size sweep (W503): estimator error vs k over
    * PREFIXES of the same 16-perm affine family ([[minhashEstError]]'s
    * tuning table, [[lshBandSweep]]'s third axis) — the first k
    * permutations of a MinHash family ARE a k-hash family, so one
    * signature pass serves every k; per-(pair,k) agreement slices the
    * shared signature. Errors quantize to the 1e-6 LONG grid before
    * the order-free sums; k is a power of two so agree/k divides
    * exactly.
    */
  def minhashKSweep(s: SparkSession, dir: String,
                    ks: Seq[Int] = Seq(4, 8, 16),
                    threshold: Double = 0.05): DataFrame = {
    val k = MhA.length
    require(ks.forall(_ <= k), s"prefix sizes must be <= $k")
    // the scaladoc's exact-division claim (agree/kk) holds only for
    // powers of two — enforce it rather than let doc and guard drift
    require(ks.forall(kk => kk > 0 && (kk & (kk - 1)) == 0),
      "prefix sizes must be powers of two (agree/k divides exactly)")
    val docSh = docShingles(s, dir, 3).persist()
    CacheScope.register(docSh) // sizes + join sides + signatures read it
    val sizes = docSh.select(col("doc_id"), size(col("shs")).as("nsh"))
    val ex = docSh.select(col("doc_id"), explode(col("shs")).as("sh"))
    val pairs = ex.select(col("doc_id").as("doc_a"), col("sh"))
      .join(ex.select(col("doc_id").as("doc_b"), col("sh")), Seq("sh"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("nsh").as("na")),
        "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("nsh").as("nb")),
        "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (col("inter") / (col("na") + col("nb") - col("inter")))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
    val sig = docSh
      .select(col("doc_id"), polyHashArray(col("shs")).as("hs"))
      .select(col("doc_id"), array((0 until k).map { j =>
        array_min(transform(col("hs"),
          h => (h * lit(MhA(j)) + lit(MhB(j))) % lit(MhP)))
      }: _*).as("sig"))
    val agreeK = ks.map { kk =>
      struct(lit(kk.toLong).as("k"),
        aggregate(zip_with(slice(col("sa"), 1, kk),
          slice(col("sb"), 1, kk),
          (x, y) => when(x === y, 1L).otherwise(0L)),
          lit(0L), (acc, v) => acc + v).as("agree"))
    }
    pairs
      .join(sig.select(col("doc_id").as("doc_a"), col("sig").as("sa")),
        "doc_a")
      .join(sig.select(col("doc_id").as("doc_b"), col("sig").as("sb")),
        "doc_b")
      .select(graft.operators.Events.q(col("jaccard"), 6).as("qj"),
        explode(array(agreeK: _*)).as("t"))
      .select(col("t.k").as("k"),
        floor(abs(col("t.agree").cast("double") / col("t.k") - col("qj"))
          * lit(1e6) + lit(0.5)).cast("long").as("e6"))
      .groupBy("k")
      .agg(count(lit(1)).as("n_pairs"), sum(col("e6")).as("se6"),
        max(col("e6")).as("me6"))
      .select(col("k"), col("n_pairs"),
        graft.operators.Events.q(col("se6").cast("double") /
          col("n_pairs").cast("double") / lit(1e6), 6).as("mean_abs_err"),
        (col("me6").cast("double") / lit(1e6)).as("max_abs_err"))
      .orderBy("k")
  }
}

