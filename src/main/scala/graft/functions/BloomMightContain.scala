package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Engine-portable Bloom-filter membership test over [[PolyHash64]]
  * shingle hashes, as a native codegen expression.
  *
  * The filter is a plain bit array of `mBits` bits (power of two)
  * carried INSIDE the expression — at plan-serialization time it ships
  * to every executor like a literal, so the membership test is a pure
  * map-side lookup: no join, no shuffle, no per-row allocation. This is
  * the decontamination shape that matters at 100 TB: the corpus-side
  * scan never exchanges data with the eval set; only the tiny bit
  * array travels.
  *
  * Probes are derived from the two independent 30-bit folds PolyHash64
  * already packs into one long (`h = h1 * 2^30 + h2`) by standard
  * double hashing, all in exact non-negative integer arithmetic below
  * 2^33 so DuckDB's checked BIGINT math replays the SAME bit positions
  * — false positives included — making the whole filter cross-engine
  * deterministic:
  *
  * {{{
  *   pos_j = ( (h // 2^30) + j * (1 + h % 2^30) ) % mBits,  j = 0..2
  * }}}
  *
  * k is fixed at 3; size the array instead (see [[BloomMightContain.mBitsFor]]):
  * at the optimal ~50% fill that is a 12.5% per-key false-positive
  * rate, and each halving of fill/m-doubling cuts it ~8x.
  *
  * Reference behavior modeled: the benchmark-decontamination pass
  * (see t12 / graft.text.Decontaminate) — this is its broadcast-filter
  * scale path.
  */
case class BloomMightContain(words: Array[Long], mBits: Int, child: Expression)
    extends UnaryExpression {
  require(mBits >= 64 && Integer.bitCount(mBits) == 1,
    s"bloom_might_contain: mBits must be a power of two >= 64, got $mBits")
  require(words.length == mBits / 64,
    s"bloom_might_contain: bit array has ${words.length} words, " +
      s"mBits=$mBits needs ${mBits / 64}")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override protected def nullSafeEval(input: Any): Any =
    BloomMightContain.test(words, mBits, input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomWords", words, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BloomMightContain.test($ref, $mBits, $c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomMightContain {

  /** Number of probes per key — fixed so the oracle SQL stays a
    * finite expansion; tune `mBits`, not k. */
  val K = 3

  /** Bit position of probe `j` for hash `h`. Mirrors the SQL form
    * `((h // 1073741824) + j * (1 + h % 1073741824)) % mBits` exactly
    * (h is always non-negative, so mask == mod). */
  def probe(h: Long, j: Int, mBits: Int): Int = {
    val h1 = h >>> 30
    val h2 = h & 0x3FFFFFFFL
    ((h1 + j * (1L + h2)) % mBits).toInt
  }

  /** All-probes-set test; shared by eval and generated code. */
  def test(words: Array[Long], mBits: Int, h: Long): Boolean = {
    var j = 0
    while (j < K) {
      val p = probe(h, j, mBits)
      if ((words(p >>> 6) & (1L << (p & 63))) == 0L) return false
      j += 1
    }
    true
  }

  /** Build the bit array from set positions (each in [0, mBits)). */
  def buildWords(positions: Array[Long], mBits: Int): Array[Long] = {
    val words = new Array[Long](mBits / 64)
    var i = 0
    while (i < positions.length) {
      val p = positions(i)
      require(p >= 0 && p < mBits, s"bloom position $p outside [0, $mBits)")
      words((p >>> 6).toInt) |= 1L << (p & 63)
      i += 1
    }
    words
  }

  /** Smallest power-of-two bit count keeping the k=3 false-positive
    * rate `(1 - e^(-3n/m))^3` at or under `targetFp` for `n` keys. */
  def mBitsFor(n: Long, targetFp: Double): Int = {
    require(n > 0 && targetFp > 0 && targetFp < 1,
      s"mBitsFor: need n > 0 and 0 < targetFp < 1, got n=$n fp=$targetFp")
    val fill = math.pow(targetFp, 1.0 / K) // set-bit fraction giving fp
    val m = math.ceil(K * n / -math.log1p(-fill)) // m: 1-e^(-3n/m) = fill
    var bits = 64L
    while (bits < m) bits <<= 1
    require(bits <= (1L << 30), s"mBitsFor: $n keys at fp=$targetFp needs " +
      s"$bits bits — beyond the 2^30 single-array bound; shard the filter")
    bits.toInt
  }

  /** Probe positions of `h` as a Column (for building the filter from
    * the eval side with the same arithmetic the test replays). */
  def probes(h: Column, mBits: Int): Column = {
    import org.apache.spark.sql.functions._
    array((0 until K).map { j =>
      (shiftright(h, 30) + lit(j.toLong) * (lit(1L) +
        h.bitwiseAND(lit(0x3FFFFFFFL)))) % mBits
    }: _*)
  }

  /** Column entry point. */
  def apply(words: Array[Long], mBits: Int, h: Column): Column =
    Shim.column(BloomMightContain(words, mBits, Shim.expression(h)))
}
