package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Full k-permutation MinHash signature of a document in ONE pass:
  * text -> distinct word shingles -> xxhash64 per shingle -> running
  * min of each of k universal-hash permutations
  * (perm_i(h) = a_i*h + b_i with wrapping 64-bit arithmetic, a_i odd
  * and golden-ratio derived — ANSI SQL would reject the intentional
  * overflow, which is why this is a custom expression).
  *
  * The r1 formulation exploded shingles into posting rows, attached a
  * k-long permutation array to EVERY posting, and ran a k-column min
  * hash-aggregate — ~k x postings longs through a shuffle (the
  * dominant cost of the MinHash pipeline at any scale). A signature is
  * a per-document quantity; computing it inside the row turns the
  * whole signature stage into a map-only scan: no explode, no
  * intermediate arrays, no shuffle. Null when the document has no
  * shingles (shorter than shingleK words), matching the groupBy
  * formulation which produced no row for such docs.
  *
  * Shingle hashing is XXH64 over the shingle's UTF-8 bytes with
  * Spark's seed (42) — identical to `xxhash64(shingle)` in the r1
  * posting pipeline, so signatures are unchanged bit for bit.
  */
case class MinHashSignature(child: Expression, shingleK: Int, k: Int)
    extends UnaryExpression {
  require(shingleK >= 1 && k >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    MinHashSignature.compute(input.asInstanceOf[UTF8String], shingleK, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val code = nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.MinHashSignature.compute($c, $shingleK, $k);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
    code
  }

  override protected def withNewChildInternal(c: Expression): MinHashSignature =
    copy(child = c)
}

object MinHashSignature {
  def apply(text: Column, shingleK: Int, k: Int): Column =
    GraftBridge.column(MinHashSignature(GraftBridge.expression(text), shingleK, k))

  /** Static kernel (called from generated code). Returns null for docs
    * with no shingles. */
  def compute(input: UTF8String, shingleK: Int, k: Int): ArrayData = {
    val shingles = WordShingles.compute(input, shingleK)
    val n = shingles.numElements()
    if (n == 0) return null
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var s = 0
    while (s < n) {
      val sh = shingles.getUTF8String(s)
      val h = XXH64.hashUnsafeBytes(sh.getBaseObject, sh.getBaseOffset, sh.numBytes, 42L)
      var i = 0
      while (i < k) {
        val a = (0x9e3779b97f4a7c15L * (2L * i + 1)) | 1L
        val b = 0xc2b2ae3d27d4eb4fL * (i + 1)
        val p = a * h + b
        if (p < mins(i)) mins(i) = p
        i += 1
      }
      s += 1
    }
    new GenericArrayData(mins)
  }
}

/** Per-band hashes of a MinHash signature: band b is
  * XXH64-chained over its rowsPerBand signature longs, seeded by the
  * band index — one long per band, no string materialisation (the r1
  * formulation cast the long slice to array<string> and concat_ws'd it
  * into the hash, allocating strings per band per doc).
  */
case class BandHashes(child: Expression, bands: Int)
    extends UnaryExpression {
  require(bands >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    BandHashes.compute(input.asInstanceOf[ArrayData], bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BandHashes.compute($c, $bands);")

  override protected def withNewChildInternal(c: Expression): BandHashes = copy(child = c)
}

object BandHashes {
  def apply(sig: Column, bands: Int): Column =
    GraftBridge.column(BandHashes(GraftBridge.expression(sig), bands))

  /** Static kernel (called from generated code). */
  def compute(sig: ArrayData, bands: Int): ArrayData = {
    val k = sig.numElements()
    val rowsPerBand = k / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 42L + b
      var i = b * rowsPerBand
      val end = i + rowsPerBand
      while (i < end) {
        h = XXH64.hashLong(sig.getLong(i), h)
        i += 1
      }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }
}
