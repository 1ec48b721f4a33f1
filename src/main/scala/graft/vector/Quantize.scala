package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Symmetric linear int8 quantization of embedding columns — the
  * serving-export step that shrinks a vector store 4× (float32 →
  * int8) ahead of distribution: per-vector absmax scaling, the
  * standard zero-point-free scheme (weights/embeddings are
  * near-symmetric, so symmetric quantization keeps 0.0 exactly
  * representable and the dot-product kernel integer-only). The PQ
  * member (27d) is the coarser codebook compression; this is the
  * faithful-per-dimension one.
  *
  * Scale shape: MAP-ONLY — absmax is an in-row array fold, the
  * quantized values an in-row transform exploded to (vec_id, dim)
  * grain; no shuffle anywhere, the 100 TB cost is the scan. Output
  * is scalar-columned (vec_id, i, q, scale) — sink-friendly and
  * exactly replayable.
  *
  * Parity contract: q = floor(x·127/absmax + 0.5) in pure IEEE double
  * ops on exactly-widened floats — reproducible on any engine;
  * |q| <= 127 by construction (x = ±absmax lands on ±127). A
  * zero vector (absmax = 0) quantizes to all zeros at scale 0 —
  * defined, not NaN. Reconstruction error (|q·absmax/127 − x|) is
  * spec-pinned against the scheme's half-step bound. */
object Quantize {

  /** Per-vector int8 quantization at (vec_id, dim) grain:
    * (vec_id, i, q, scale) with i 0-based, scale the vector's absmax.
    */
  def int8(df: DataFrame, id: Column, emb: Column): DataFrame = {
    val absmax = aggregate(
      transform(emb, x => abs(x.cast("double"))),
      lit(0.0), (acc, x) => greatest(acc, x))
    df.select(id.as("vec_id"), posexplode(emb).as(Seq("i", "_v")),
        absmax.as("scale"))
      .select(col("vec_id"), col("i"),
        when(col("scale") === 0.0, lit(0L))
          .otherwise(floor(col("_v").cast("double") * 127.0 / col("scale")
            + 0.5).cast("long")).as("q"),
        col("scale"))
  }
}
