package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distributed heavy hitters — frequent-item detection over a 100 TB
  * column (the training-data use: dominant domains/URLs/templates/
  * tokens a corpus build caps or strips). Two stages:
  *
  *  1. a MISRA-GRIES sketch as a typed [[Aggregator]] (constant
  *     memory: k counters per partition, algebraic merge) produces the
  *     candidate set. The classical guarantee: any item with frequency
  *     > n/(k+1) SURVIVES the sketch, so with k chosen above
  *     1/minFrac the candidates are a superset of every true heavy
  *     hitter — the sketch can only over-approximate.
  *  2. an EXACT counting pass over the candidates only (an isin filter
  *     the scan can push down + one hash aggregate) with the total
  *     count as an in-plan broadcast scalar. The integer threshold
  *     test (den·cnt >= num·total) keeps the cut exact on any engine.
  *
  * Output is therefore EXACTLY the items with frequency >= minFrac —
  * deterministic and SQL-oracle-able — while the scan-side memory
  * stays O(k) regardless of cardinality (the naive groupBy-all-items
  * plan shuffles the full vocabulary; this shuffles k candidates).
  */
object HeavyHitters {

  /** Misra-Gries frequent-items sketch over strings: at most k
    * counters; reduce decrements all when full, merge combines and
    * re-trims to k by the (k+1)-largest count. */
  class MisraGries(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    override def zero: Map[String, Long] = Map.empty

    override def reduce(b: Map[String, Long], item: String): Map[String, Long] =
      if (b.contains(item)) b.updated(item, b(item) + 1L)
      else if (b.size < k) b.updated(item, 1L)
      else b.view.mapValues(_ - 1L).filter(_._2 > 0L).toMap

    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val combined = (a.keySet ++ b.keySet).iterator
        .map(x => x -> (a.getOrElse(x, 0L) + b.getOrElse(x, 0L))).toMap
      if (combined.size <= k) combined
      else {
        val cut = combined.values.toSeq.sorted(Ordering[Long].reverse)(k)
        combined.view.mapValues(_ - cut).filter(_._2 > 0L).toMap
      }
    }

    override def finish(b: Map[String, Long]): Map[String, Long] = b
    override def bufferEncoder: Encoder[Map[String, Long]] =
      Encoders.kryo[Map[String, Long]]
    override def outputEncoder: Encoder[Map[String, Long]] =
      Encoders.kryo[Map[String, Long]]
  }

  /** Items of `item` with frequency >= num/den of all rows, with their
    * exact counts. `sketchK` must exceed den/num for the no-miss
    * guarantee (asserted). */
  def frequentItems(df: DataFrame, item: Column,
                    num: Long, den: Long, sketchK: Int): DataFrame = {
    require(num > 0 && den > 0, "threshold fraction must be positive")
    require(sketchK.toLong * num > den,
      s"sketchK=$sketchK cannot guarantee recall at threshold $num/$den " +
        s"(need sketchK > ${den / num})")
    val spark = df.sparkSession
    import spark.implicits._
    val items = df.select(item.cast("string").as("item")).as[String]
    // stage 1: the sketch (tiny: <= sketchK entries) -> candidate list
    val candidates = items.select(new MisraGries(sketchK).toColumn.name("m"))
      .head().keys.toSeq
    if (candidates.isEmpty) {
      spark.emptyDataFrame.select(lit("").as("item"), lit(0L).as("cnt"))
        .where(lit(false))
    } else {
      // stage 2: exact counts of candidates only; total rides in-plan
      val total = broadcast(df.agg(count(lit(1)).as("_total")))
      items.toDF("item")
        .filter(col("item").isin(candidates: _*))
        .groupBy(col("item")).agg(count(lit(1)).as("cnt"))
        .crossJoin(total)
        .filter(col("cnt") * den >= col("_total") * num)
        .select(col("item"), col("cnt"))
    }
  }
}
