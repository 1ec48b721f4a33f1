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
  * items), so it COLLECTS driver-side and rides into the corpus scan
  * inside ONE codegen'd kernel ([[graft.functions.ArgmaxCosine]],
  * the broadcast-model pattern): each corpus row computes its best
  * match in-row and emits exactly one output row — map-only, NO
  * shuffle, and none of the |corpus| x |eval| row amplification the
  * crossJoin formulation pays before its aggregate (three orders of
  * magnitude of intermediate rows at a realistic eval size). This is
  * the EXACT member: at extreme eval sizes the IVF/LSH candidate
  * generators bound the per-row compare, exactly as in ANN serving. */
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
    val evalRows = eval.select(eId.cast("long").as("_eid"), eEmb.as("_ee"))
      .collect().map(r =>
        r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    require(evalRows.nonEmpty,
      "empty eval set: nothing to decontaminate against")
    val m = graft.functions.EvalMatrix.fromSorted(evalRows.toSeq)
    corpus
      .select(cId.as("vec_id"), graft.functions.ArgmaxCosine(cEmb, m).as("_m"))
      .select(col("vec_id"), col("_m.eval_id").as("eval_id"),
        graft.functions.Numeric.cround(col("_m.sim"), 6).as("sim"),
        (col("_m.sim") >= threshold).cast("int").as("flagged"))
  }
}
