package graft.olap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synthetic PARTSUPP relation — the driver's table set (TESTDATA.md)
  * ships no partsupp parquet, which blocked the TPC-H partsupp family
  * (Q2/Q9/Q20). Rather than skip the shapes, rebuild the relation
  * deterministically from data both engines share: part keys and the
  * supplier count. Pure integer arithmetic (ring-offset suppkeys — the
  * dbgen layout spreads a part's 4 suppliers s_cnt/4 apart around the
  * supplier ring; availqty/supplycost are modular hashes of the key
  * pair), so the DuckDB oracle reconstructs the identical relation in
  * SQL and the queries stay hash-comparable.
  *
  * Scale shape: map-side only. One broadcast scalar (supplier count)
  * crossed into part, one 4-row explode per part — partsupp never
  * shuffles to exist; downstream joins decide their own distribution.
  */
object Partsupp {

  /** partsupp(ps_partkey, ps_suppkey, ps_availqty, ps_supplycost):
    * 4 rows per part; suppkeys 0-based like the driver's tables. */
  def build(part: DataFrame, supplier: DataFrame): DataFrame = {
    val sCnt = broadcast(supplier.agg(count(lit(1)).as("s_cnt")))
    part.select(col("p_partkey").as("ps_partkey"))
      .crossJoin(sCnt)
      .select(col("ps_partkey"), col("s_cnt"),
        explode(array((0L to 3L).map(lit): _*)).as("i"))
      .withColumn("ps_suppkey",
        (col("ps_partkey") + col("i") * expr("s_cnt div 4")) % col("s_cnt"))
      .withColumn("ps_availqty",
        (col("ps_partkey") * 31L + col("ps_suppkey") * 17L) % 9999L + 1L)
      .withColumn("ps_supplycost",
        ((col("ps_partkey") * 131L + col("ps_suppkey") * 29L) % 90000L + 10000L)
          / lit(100.0))
      .select("ps_partkey", "ps_suppkey", "ps_availqty", "ps_supplycost")
  }

  /** The DuckDB mirror of [[build]] as a WITH-clause prefix; every
    * partsupp-family oracle prepends this so both engines query the
    * byte-identical relation. `//` is DuckDB integer division (Spark
    * side uses `div`); doubles come from the same int/100.0 op. */
  val OracleCte: String =
    """WITH ps0 AS (
      |  SELECT p_partkey AS ps_partkey,
      |         (p_partkey + t.i * (sc.s_cnt // 4)) % sc.s_cnt AS ps_suppkey
      |  FROM part, (SELECT COUNT(*) AS s_cnt FROM supplier) sc,
      |       (VALUES (0),(1),(2),(3)) t(i)
      |), partsupp AS (
      |  SELECT ps_partkey, ps_suppkey,
      |         (ps_partkey * 31 + ps_suppkey * 17) % 9999 + 1 AS ps_availqty,
      |         ((ps_partkey * 131 + ps_suppkey * 29) % 90000 + 10000) / 100.0 AS ps_supplycost
      |  FROM ps0
      |)""".stripMargin
}
