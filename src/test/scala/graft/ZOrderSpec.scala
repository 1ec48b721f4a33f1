package graft

import org.apache.spark.sql.functions._

import graft.functions.ZOrder2
import graft.sources.ZOrderLayout

/** Z-order layout: Morton-key correctness and the data-skipping claim
  * itself — file-level min/max footprints prune BOTH dimensions after
  * a Z-ordered write, where a lexicographic sort prunes only its
  * leading column. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("Morton interleave: hand values and bit positions") {
    assert(ZOrder2.interleave(0L, 0L) == 0L)
    assert(ZOrder2.interleave(1L, 0L) == 1L) // left takes even bits
    assert(ZOrder2.interleave(0L, 1L) == 2L)
    assert(ZOrder2.interleave(3L, 5L) == 39L) // 101 ⋈ 011 = 100111
    // 32-bit domain: the top halves interleave without collision
    assert(ZOrder2.interleave(0xFFFFFFFFL, 0L) == 0x5555555555555555L)
    assert(ZOrder2.interleave(0L, 0xFFFFFFFFL) == 0xAAAAAAAAAAAAAAAAL)
  }

  test("the expression matches the kernel and stays codegen'd") {
    val df = spark.range(1000).select(col("id"),
      ZOrder2(col("id") % 100, expr("id div 100")).as("z"))
    df.collect().foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == ZOrder2.interleave(id % 100, id / 100))
    }
    // "*(1)" marks the whole-stage-codegen stage the projection
    // (and so the zorder2 expression) runs inside
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("zorder2"), plan)
  }

  test("z-ordered files cluster BOTH dimensions; lexicographic only one") {
    // a 128x128 grid, one row per cell, 16 output files
    val grid = spark.range(128L * 128L)
      .select(col("id"), (col("id") % 128).as("x"), expr("id div 128").as("y"))
    val base = "/tmp/graft_zorder"
    ZOrderLayout.write(grid, s"$base/z", col("x"), col("y"), numFiles = 16)
    grid.repartitionByRange(16, col("x"), col("y"))
      .sortWithinPartitions("x", "y")
      .write.mode("overwrite").parquet(s"$base/lex")

    def footprints(path: String): Array[(Long, Long, Long, Long)] =
      spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg(min("x"), max("x"), min("y"), max("y"))
        .collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

    val zf = footprints(s"$base/z")
    val lf = footprints(s"$base/lex")
    assert(zf.length >= 14 && lf.length >= 14, s"${zf.length}/${lf.length}")
    def touching(fs: Array[(Long, Long, Long, Long)],
                 xr: (Long, Long), yr: (Long, Long)): Int =
      fs.count { case (x0, x1, y0, y1) =>
        x1 >= xr._1 && x0 <= xr._2 && y1 >= yr._1 && y0 <= yr._2 }

    // a filter on the TRAILING dimension: lexicographic layout cannot
    // prune (every file spans all y); the z-order layout can
    val full = (0L, 127L)
    val yBox = (0L, 7L)
    assert(touching(lf, full, yBox) == lf.length, lf.mkString(","))
    assert(touching(zf, full, yBox) <= 8,
      s"z-order y-pruning too weak: ${zf.mkString(",")}")
    // the LEADING dimension still prunes under z-order (both cluster)
    val xBox = (0L, 7L)
    assert(touching(zf, xBox, full) <= 8,
      s"z-order x-pruning too weak: ${zf.mkString(",")}")
    // and the box query touches fewer z-files than the y-only bound
    assert(touching(zf, xBox, yBox) <= touching(zf, full, yBox))
  }
}
