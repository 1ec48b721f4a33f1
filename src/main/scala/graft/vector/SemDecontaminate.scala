package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SEMANTIC test-set decontamination — the third member of the
  * decontamination family (31e exact n-gram overlap, 31m fuzzy
  * n-gram Jaccard): eval items match training docs by EMBEDDING
  * similarity, catching the paraphrased/translated/reworded leaks
  * n-gram overlap is blind to — the published gap in string-based
  * decontamination that motivates embedding-based audits.
  *
  * Scale shape: an eval suite is benchmark-sized (thousands of
  * items), so it rides the BROADCAST side whole; the corpus scans
  * ONCE through a broadcast cross join (the declared
  * crossJoin-against-broadcast-table pattern the centroid scorers
  * use) and the per-doc best match reduces MAP-SIDE (partial max of
  * a packed (sim, -eval_id) struct per partition) — no corpus-sized
  * shuffle, no corpus-side index to build. This is the EXACT member:
  * at extreme eval sizes the IVF/LSH candidate generators bound the
  * per-row compare, exactly as they do for ANN serving. */
object SemDecontaminate {

  /** Every corpus vector with its best eval match: (vec_id, eval_id,
    * sim rounded to 6, flagged = sim >= threshold). Ties at the max
    * break to the smallest eval id — deterministic. A zero-norm vector
    * on either side has no direction: its cosine is DEFINED as 0 here
    * (Spark's raw 0/0 would be NaN — which its ordering treats as
    * LARGEST, spuriously flagging everything — where DuckDB yields
    * NULL; pinning 0 keeps both engines identical and unflagged at
    * any positive threshold). An EMPTY eval set fails fast rather
    * than silently returning zero rows against the one-row-per-corpus
    * contract. */
  def flag(corpus: DataFrame, cId: Column, cEmb: Column,
           eval: DataFrame, eId: Column, eEmb: Column,
           threshold: Double): DataFrame = {
    val c = corpus.select(cId.as("vec_id"), cEmb.as("_ce"),
      Similarity.norm(cEmb).as("_cn"))
    val e = eval.select(eId.as("_eid"), eEmb.as("_ee"),
      Similarity.norm(eEmb).as("_en"))
    require(e.take(1).nonEmpty,
      "empty eval set: nothing to decontaminate against")
    c.crossJoin(broadcast(e))
      .withColumn("_sim", when(col("_cn") * col("_en") > 0.0,
        Similarity.dot(col("_ce"), col("_ee")) / (col("_cn") * col("_en")))
        .otherwise(lit(0.0)))
      .groupBy(col("vec_id"))
      .agg(max(struct(col("_sim").as("s"), (-col("_eid")).as("nid"))).as("_m"))
      .select(col("vec_id"), (-col("_m.nid")).as("eval_id"),
        graft.functions.Numeric.cround(col("_m.s"), 6).as("sim"),
        (col("_m.s") >= threshold).cast("int").as("flagged"))
  }
}
