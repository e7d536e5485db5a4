package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Spatial tier: grid-cell-blocked geometric joins over synthetic
  * integer coordinates derived deterministically from fixture keys.
  *
  * The blocking pattern is the 2-D instance of the engine's universal
  * near-duplicate discipline (LSH bands, IVF probe lists, dHash
  * buckets): bucket both sides by a cell whose width equals the match
  * radius, join each probe cell to its 3×3 neighborhood, and verify
  * candidates with the exact predicate — candidates per row are
  * bounded by local density, never the corpus, so the join survives a
  * 100× scale-up where an all-pairs distance join dies. Coordinates
  * are synthesized from keys by the replicable affine +
  * 2×(multiply, xorshift) mix on the [0, 2^40) grid shared by every
  * sketch op here, so both engines place every point identically and
  * the whole pipeline stays in exact LONG arithmetic (squared
  * distances — no sqrt, no doubles).
  */
object Spatial {

  private val Mod40 = 1099511627776L

  /** Affine + 2×(multiply, xorshift) scramble of `k` on the 2^40
    * grid — the engine's shared replicable mix (`salt` decorrelates
    * the x and y streams). */
  private def mix40(k: Column, salt: Long): Column = {
    val z0 = pmod(k * lit(1000003L) + lit(salt), lit(Mod40))
    (1 to 2).foldLeft(z0) { (acc, _) =>
      val hm = (acc * lit(8388593L)) % lit(Mod40)
      hm.bitwiseXOR(shiftright(hm, 20))
    }
  }

  /** Customers and suppliers dropped onto a `grid`×`grid` integer
    * plane (key-derived deterministic coordinates), then every
    * (customer, supplier) pair within Euclidean distance `r` is found
    * by the cell-blocked join and rolled up per market segment (W542).
    * Cell width = r, so a supplier's true matches live entirely inside
    * its 3×3 cell neighborhood — 9 candidate cells per supplier
    * regardless of corpus size. The exact verify is the integer test
    * dx² + dy² ≤ r². Surfaced per segment: pair count, distinct
    * matched customers, and the exact squared-distance sum/min.
    */
  def geoRadiusJoin(s: SparkSession, dir: String, r: Long = 150L,
                    grid: Long = 10000L): DataFrame = {
    def cellOf(c: Column): Column = graft.operators.Ranks.exactDiv(c, lit(r))
    val cust = Tables.customer(s, dir)
      .select(col("c_custkey").cast("long").as("cid"),
        col("c_mktsegment").as("segment"),
        pmod(mix40(col("c_custkey").cast("long"), 1L), lit(grid)).as("cx"),
        pmod(mix40(col("c_custkey").cast("long"), 2L), lit(grid)).as("cy"))
      .withColumn("ccellx", cellOf(col("cx")))
      .withColumn("ccelly", cellOf(col("cy")))
    val supp = Tables.supplier(s, dir)
      .select(col("s_suppkey").cast("long").as("sid"),
        pmod(mix40(col("s_suppkey").cast("long"), 3L), lit(grid)).as("sx"),
        pmod(mix40(col("s_suppkey").cast("long"), 4L), lit(grid)).as("sy"))
      .withColumn("scellx", cellOf(col("sx")))
      .withColumn("scelly", cellOf(col("sy")))
      // 3×3 probe neighborhood: 9 candidate cells per supplier, a
      // constant fan-out (suppliers are the smaller side — at fixture
      // shape the 9× side still broadcasts; at parity both sides
      // shuffle on the cell key and density bounds the match work)
      .select(col("sid"), col("sx"), col("sy"), col("scellx"),
        col("scelly"), explode(sequence(lit(-1L), lit(1L))).as("dx"))
      .select(col("sid"), col("sx"), col("sy"),
        (col("scellx") + col("dx")).as("px"), col("scelly"),
        explode(sequence(lit(-1L), lit(1L))).as("dy"))
      .select(col("sid"), col("sx"), col("sy"), col("px"),
        (col("scelly") + col("dy")).as("py"))
    val d2 = (col("cx") - col("sx")) * (col("cx") - col("sx")) +
      (col("cy") - col("sy")) * (col("cy") - col("sy"))
    cust.join(supp,
        col("ccellx") === col("px") && col("ccelly") === col("py"))
      .filter(d2 <= lit(r * r))
      .groupBy("segment")
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("cid")).as("n_customers"),
        sum(d2).as("d2_sum"), min(d2).as("d2_min"))
      .orderBy("segment")
  }
}
