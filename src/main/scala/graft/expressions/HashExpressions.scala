package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the dedup tier (SURVEY §4: the one
  * place the built-in surface genuinely lacks an operator). Both are
  * per-row scalar computations over `array<string>` token/shingle
  * columns, so an Expression (evaluated inside the task, no extra
  * explode/shuffle) beats the 64-way explode a pure-built-in encoding
  * would need.
  *
  * Both implement `doGenCode` (a call into the shared static evaluator —
  * the same pattern Spark's own hash expressions use), so projections
  * containing them stay inside whole-stage codegen instead of breaking
  * the span with a CodegenFallback row-by-row interpreter.
  */
object HashExpressions {
  private def xx(s: UTF8String, seed: Long): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)

  /** Shared evaluator for SimHash64 (called from generated code). */
  def simhashEval(input: ArrayData): Long = {
    val votes = new Array[Int](64)
    var i = 0
    while (i < input.numElements()) {
      if (!input.isNullAt(i)) {
        val h = xx(input.getUTF8String(i), 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Shared evaluator for MinHashSignature (called from generated code). */
  def minhashEval(input: ArrayData, k: Int): ArrayData = {
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < input.numElements()) {
      if (!input.isNullAt(i)) {
        val s = input.getUTF8String(i)
        val h1 = xx(s, 0L)
        val h2 = xx(s, 0x9E3779B97F4A7C15L) | 1L // odd => full-period mix
        var j = 0
        var h = h1
        while (j < k) {
          if (h < sig(j)) sig(j) = h
          h += h2
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  private val Evaluator = "graft.expressions.HashExpressions$.MODULE$"

  /** 64-bit SimHash over an array of tokens: per-token xxhash64, each bit
    * votes ±1 weighted by occurrence; the sign of each bit-total forms
    * the signature. Near-duplicate texts land within a small Hamming
    * distance.
    */
  case class SimHash64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any =
      simhashEval(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Evaluator.simhashEval($c)")
    override protected def withNewChildInternal(c: Expression): SimHash64 =
      copy(child = c)
  }

  /** MinHash signature: `k` permutations via the standard double-hash
    * construction h_j(x) = h1(x) + j*h2(x) (Kirsch-Mitzenmacher) — two
    * real xxhash64 passes per element instead of `k`, then `k` cheap
    * mixes. Element `j` of the result is the minimum over the set.
    * Jaccard(a, b) ≈ fraction of agreeing positions. Empty input yields
    * Long.MaxValue everywhere (agrees only with other empties).
    */
  case class MinHashSignature(child: Expression, k: Int)
      extends UnaryExpression {
    require(k > 0, "k must be positive")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      minhashEval(input.asInstanceOf[ArrayData], k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Evaluator.minhashEval($c, $k)")
    override protected def withNewChildInternal(c: Expression): MinHashSignature =
      copy(child = c)
  }

  /** Shared evaluator for PolyHashArray (called from generated code).
    * Classic base-31 polynomial hash of each string's code points,
    * reduced mod 2^40: small enough that an oracle can restate it in
    * pure SQL without BIGINT overflow, large enough that collisions are
    * negligible at fixture scale. ASCII inputs only need byte handling,
    * but decode via UTF8String.toString codepoints for exactness.
    */
  def polyHashEval(input: ArrayData): ArrayData = {
    val mask = (1L << 40) - 1
    val out = new Array[Long](input.numElements())
    var i = 0
    while (i < input.numElements()) {
      if (!input.isNullAt(i)) {
        val s = input.getUTF8String(i).toString
        var h = 0L
        var j = 0
        while (j < s.length) {
          val cp = s.codePointAt(j)
          h = (h * 31 + cp) & mask
          j += Character.charCount(cp)
        }
        out(i) = h
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Shared evaluator for SimHash40 (called from generated code): same
    * vote construction as `simhashEval` but over a 40-bit token hash —
    * base-31 poly fold mod 2^40, then two rounds of multiply(+mask)/
    * xorshift mixing with constants small enough that every step is
    * overflow-free BIGINT arithmetic an SQL oracle can restate.
    */
  def simhash40Eval(input: ArrayData): Long = {
    val mask = (1L << 40) - 1
    val votes = new Array[Int](40)
    var i = 0
    while (i < input.numElements()) {
      if (!input.isNullAt(i)) {
        val s = input.getUTF8String(i).toString
        var h = 0L
        var j = 0
        while (j < s.length) {
          val cp = s.codePointAt(j)
          h = (h * 31 + cp) & mask
          j += Character.charCount(cp)
        }
        h = (h * 8388593L) & mask; h ^= (h >>> 20)
        h = (h * 8388593L) & mask; h ^= (h >>> 20)
        var b = 0
        while (b < 40) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 40) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** 40-bit SimHash over an array of tokens (see `simhash40Eval`) — the
    * oracle-replicable variant the dedup_simhash query uses; `SimHash64`
    * (xxhash64-based) remains the stronger library-surface signature.
    */
  case class SimHash40(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any =
      simhash40Eval(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Evaluator.simhash40Eval($c)")
    override protected def withNewChildInternal(c: Expression): SimHash40 =
      copy(child = c)
  }

  /** Per-element polynomial hash of an `array<string>` (see
    * `polyHashEval`): the oracle-replicable hash used by the winnowing
    * fingerprint operator.
    */
  case class PolyHashArray(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any =
      polyHashEval(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Evaluator.polyHashEval($c)")
    override protected def withNewChildInternal(c: Expression): PolyHashArray =
      copy(child = c)
  }

  /** Shared evaluator for SetProbeCount (called from generated code):
    * |distinct(input) ∩ set|, with a null element counting iff both
    * sides contain one — exactly `size(array_intersect(input, lit))`.
    * Only MATCHED elements enter the per-row dedup set, so its size is
    * bounded by the reference set, not the row.
    */
  def setProbeCountEval(input: ArrayData,
                        set: java.util.HashSet[UTF8String],
                        setHasNull: Boolean): Int = {
    val matched = new java.util.HashSet[UTF8String](8)
    var nullMatch = 0
    var i = 0
    while (i < input.numElements()) {
      if (input.isNullAt(i)) {
        if (setHasNull) nullMatch = 1
      } else {
        val e = input.getUTF8String(i)
        if (set.contains(e)) matched.add(e)
      }
      i += 1
    }
    matched.size + nullMatch
  }

  /** `size(array_intersect(child, <fixed set>))` with the set carried
    * as ONE reference object whose hash table builds once per executor
    * (`@transient lazy`) — the decontamination probe. Every built-in
    * encoding pays per row or per plan instead:
    * `array_intersect(col, lit(set))` rebuilds the lookup table per
    * document, and a 5k-literal `isin` costs the optimizer seconds of
    * fixed-point traversal over a 5k-child `In` before `InSet` kicks in
    * (both measured 2-4× slower at sf0.1). `StaticSetProbeRule`
    * rewrites the built-in form to this expression automatically.
    */
  case class SetProbeCount(child: Expression, elements: Seq[String],
                           setHasNull: Boolean = false)
      extends UnaryExpression {
    override def dataType: DataType = IntegerType
    @transient private lazy val set = {
      val s = new java.util.HashSet[UTF8String](elements.size * 2)
      elements.foreach(e => s.add(UTF8String.fromString(e)))
      s
    }
    override def nullSafeEval(input: Any): Any =
      setProbeCountEval(input.asInstanceOf[ArrayData], set, setHasNull)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("probeSet", set, "java.util.HashSet")
      defineCodeGen(ctx, ev,
        c => s"$Evaluator.setProbeCountEval($c, $ref, $setHasNull)")
    }
    override protected def withNewChildInternal(c: Expression): SetProbeCount =
      copy(child = c)
  }

  def simhash64(c: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(c)))

  def polyHashArray(c: Column): Column =
    ColumnBridge.column(PolyHashArray(ColumnBridge.expression(c)))

  def simhash40(c: Column): Column =
    ColumnBridge.column(SimHash40(ColumnBridge.expression(c)))

  def minhashSignature(c: Column, k: Int): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(c), k))

  def setProbeCount(c: Column, elements: Seq[String]): Column =
    ColumnBridge.column(SetProbeCount(ColumnBridge.expression(c), elements))

  /** Shared evaluator for HashedSetProbeCount (called from generated
    * code): hash each element with xxhash64 seed 42 (bit-identical to
    * the built-in `xxhash64(stringCol)`, so the probe side can be
    * collected with the built-in) and count DISTINCT hashes present in
    * the sorted reference array. Binary search over a primitive
    * `long[]` — no boxing on the probe path; the tiny matched-set is
    * bounded by the reference size.
    */
  def hashedProbeCountEval(input: ArrayData, sorted: Array[Long]): Int = {
    val matched = new java.util.HashSet[java.lang.Long](8)
    var i = 0
    while (i < input.numElements()) {
      if (!input.isNullAt(i)) {
        val s = input.getUTF8String(i)
        val h = xx(s, 42L)
        if (java.util.Arrays.binarySearch(sorted, h) >= 0) matched.add(h)
      }
      i += 1
    }
    matched.size
  }

  /** [[SetProbeCount]] with the reference set carried as xxhash64
    * LONGs instead of strings — the decontamination probe's
    * driver-memory fix (VERDICT r5 #4): collecting 2M shingle STRINGS
    * held ~40+ bytes each boxed on the driver and sorted them as
    * UTF8; the hashed probe is 8 bytes/entry in one primitive array
    * (~6-10× smaller), and the executor-side reference is the same
    * single shared object. Matching by hash admits a ~n²/2⁶⁴ false
    * merge — zero observed on the fixtures, and the distributed
    * fallback uses the same hashes so both paths agree.
    */
  case class HashedSetProbeCount(child: Expression, elements: Array[Long])
      extends UnaryExpression {
    override def dataType: DataType = IntegerType
    @transient private lazy val sorted = {
      val a = elements.clone()
      java.util.Arrays.sort(a)
      a
    }
    override def nullSafeEval(input: Any): Any =
      hashedProbeCountEval(input.asInstanceOf[ArrayData], sorted)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("probeHashes", sorted, "long[]")
      defineCodeGen(ctx, ev,
        c => s"$Evaluator.hashedProbeCountEval($c, $ref)")
    }
    override protected def withNewChildInternal(c: Expression): HashedSetProbeCount =
      copy(child = c)
  }

  def hashedSetProbeCount(c: Column, elements: Array[Long]): Column =
    ColumnBridge.column(
      HashedSetProbeCount(ColumnBridge.expression(c), elements))
}
