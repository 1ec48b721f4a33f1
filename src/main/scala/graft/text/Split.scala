package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PolyFingerprint

/** Leakage-safe train/val/test splitting at GROUP grain — the
  * held-out-domain split an LLM data pipeline needs instead of a
  * row-wise random split: near-duplicate documents cluster inside a
  * source/domain, so hashing each GROUP (not each row) into a split
  * keeps every document of a domain on the same side and a row-level
  * near-dup of a test document cannot sit in train *via its domain*
  * (sklearn's GroupShuffleSplit semantics, made deterministic).
  *
  * Scale shape: assignment is MAP-ONLY — the group key is hashed
  * per-row ([[PolyFingerprint]], the engine's cross-engine-replayable
  * string hash), so there is no group table, no join, no shuffle; the
  * split of a 100 TB corpus is one codegen'd projection. Adding data
  * never reassigns an existing group (the hash is content-determined,
  * not quota-balanced) — split fractions are therefore approximate,
  * governed by the hash uniformity across groups and the group-size
  * distribution; exact-quota selection is a different operator
  * ([[SampleK]]).
  *
  * What the grouped split does NOT guarantee: near-dups that straddle
  * groups can still straddle splits. [[leakage]] measures exactly
  * that residue from any near-dup pair evidence (Jaccard / MinHash /
  * SimHash / embedding — anything emitting (d1, d2) pairs), giving
  * the pipeline its decontamination worklist.
  */
object Split {

  /** Assign each row to train/val/test by its group's hash bucket:
    * bucket = fingerprint(group) mod 100; < `trainPct` → train,
    * < `trainPct`+`valPct` → val, else test.
    * Output: (id, group, bucket, split). */
  def byGroup(df: DataFrame, id: Column, group: Column,
              trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct >= 1 && valPct >= 1 && trainPct + valPct <= 99,
      s"need 1 <= trainPct, 1 <= valPct, trainPct+valPct <= 99; " +
        s"got $trainPct/$valPct")
    df.select(id.as("doc_id"), group.as("grp"),
        pmod(PolyFingerprint(group), lit(100L)).as("bucket"))
      .withColumn("split",
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise("test"))
  }

  /** Cross-split leakage worklist: near-dup pairs (d1, d2) whose
    * members landed in different splits. `assign` is [[byGroup]]'s
    * output (or any (doc_id, split) table); `pairs` any pair
    * evidence. Two broadcast-or-shuffle equi-joins on doc id against
    * a pair table that is output-sized, never corpus². */
  def leakage(assign: DataFrame, pairs: DataFrame): DataFrame = {
    pairs.select(col("d1"), col("d2"))
      .join(assign.select(col("doc_id").as("d1"),
        col("split").as("split_1")), Seq("d1"))
      .join(assign.select(col("doc_id").as("d2"),
        col("split").as("split_2")), Seq("d2"))
      .filter(col("split_1") =!= col("split_2"))
      .select(col("d1"), col("d2"), col("split_1"), col("split_2"))
  }
}
