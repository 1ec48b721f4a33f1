package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{HammingDistance, SimHash}

/** SimHash near-duplicate pairs at scale: by the pigeonhole principle,
  * two fingerprints within Hamming distance d must agree on at least
  * one of d+1 disjoint bit-bands, so candidates come from
  * band-equality joins (no all-pairs comparison) and are verified with
  * the codegen'd HammingDistance expression.
  */
object SimHashDedup {
  def nearDupPairs(df: DataFrame, id: Column, text: Column,
                   maxHamming: Int = 3, bits: Int = 30): DataFrame =
    bandedHammingPairs(
      df.select(id.as("doc_id"), SimHash(text, bits).as("fp")),
      maxHamming, bits)

  /** Generic banded-Hamming pair search over ANY long fingerprint
    * column — the text SimHash path above and the perceptual image-hash
    * path (multimodal.ImageDedup) share it. `fps` must have columns
    * (doc_id, fp). EXACT for the given radius: bands = maxHamming+1
    * disjoint bands guarantee no false negative (pigeonhole), and the
    * codegen'd HammingDistance verify removes false positives. */
  def bandedHammingPairs(fps: DataFrame, maxHamming: Int,
                         bits: Int): DataFrame = {
    require(bits >= 2 && bits <= 64, "fingerprint width must be 2..64 bits")
    require(maxHamming >= 0 && maxHamming < bits)
    val bands = maxHamming + 1
    val bandBits = bits / bands // last band absorbs the remainder
    require(bandBits >= 1, "more bands than bits")
    def mask(width: Int): Column =
      if (width >= 64) lit(-1L) else lit((1L << width) - 1)
    def bandVal(fp: Column, b: Int): Column = {
      val lo = b * bandBits
      val width = if (b == bands - 1) bits - lo else bandBits
      shiftright(fp, lo).bitwiseAND(mask(width))
    }
    val banded = fps.select(col("doc_id"), col("fp"),
      posexplode(array((0 until bands).map(b => bandVal(col("fp"), b)): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bv")
    // one shuffle of the banded rows into bucket groups (the
    // Postings.coPairs shape, with the fingerprint riding along in the
    // collected struct so verification needs no join-back); sort_array
    // orders by doc_id first, so d1 < d2 by construction. A pair of
    // near-identical fingerprints collides in MANY bands (all of them,
    // for exact duplicates — and duplicate classes are exactly what a
    // dedup corpus is full of), so instead of a cross-band distinct
    // over the expanded pairs, each pair is kept only in its FIRST
    // agreeing band: a codegen'd scalar filter that makes global
    // uniqueness structural and drops the expansion's duplicate bulk
    // before it ever reaches a shuffle.
    val firstAgree = (0 until bands).foldRight(lit(-1)) { (b, rest) =>
      when(bandVal(col("_a.fp"), b) === bandVal(col("_b.fp"), b), lit(b))
        .otherwise(rest)
    }
    val groups = banded.groupBy(col("band"), col("bv"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("fp")))).as("_ds"))
      .filter(size(col("_ds")) >= 2)
    groups
      .select(col("band"), col("_ds"), posexplode(col("_ds")).as(Seq("_i", "_a")))
      .select(col("band"), col("_a"),
        explode(slice(col("_ds"), col("_i") + lit(2),
          size(col("_ds")) - col("_i") - lit(1))).as("_b"))
      .filter(col("band") === firstAgree)
      .select(col("_a.doc_id").as("d1"), col("_b.doc_id").as("d2"),
        HammingDistance(col("_a.fp"), col("_b.fp")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }
}
