package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{HammingDistance, SimHash}

/** SimHash near-duplicate pairs at scale: by the pigeonhole principle,
  * two 30-bit fingerprints within Hamming distance d must agree on at
  * least one of d+1 disjoint bit-bands, so candidates come from
  * band-equality joins (no all-pairs comparison) and are verified with
  * the codegen'd HammingDistance expression.
  */
object SimHashDedup {
  def nearDupPairs(df: DataFrame, id: Column, text: Column,
                   maxHamming: Int = 3, bits: Int = 30): DataFrame = {
    val bands = maxHamming + 1
    val bandBits = bits / bands // last band absorbs the remainder
    val fps = df.select(id.as("doc_id"), SimHash(text, bits).as("fp"))
    val banded = fps.select(col("doc_id"), col("fp"),
      posexplode(array((0 until bands).map { b =>
        val lo = b * bandBits
        val width = if (b == bands - 1) bits - lo else bandBits
        shiftright(col("fp"), lo).bitwiseAND(lit((1L << width) - 1))
      }: _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bv")
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        col("a.fp").as("fp1"), col("b.fp").as("fp2"))
      .distinct()
      .withColumn("hamming", HammingDistance(col("fp1"), col("fp2")))
      .filter(col("hamming") <= maxHamming)
      .select("d1", "d2", "hamming")
  }
}
