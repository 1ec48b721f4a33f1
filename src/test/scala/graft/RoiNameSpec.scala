package graft

import org.apache.spark.sql.functions._

import graft.operators.RoiName

/** The reference's ROI/feature-row naming contract (parse_xml.py:
  * 195-218): 1-indexed CellID/FrameID and the FrameID-CellID-SpotID
  * filename, each component zero-padded to its column's max digit
  * count PER VIDEO — pinned on hand-computed values with two videos
  * of different magnitudes so the per-video widths genuinely differ. */
class RoiNameSpec extends SparkSpec {
  import spark.implicits._

  test("per-video zero-padded names, hand-computed") {
    // video 1: frames up to 9 (+1 -> 10, width 2), tracks up to 4
    // (+1 -> 5, width 1), spots up to 123 (width 3)
    // video 2: everything single digit after 1-indexing
    val df = Seq(
      (1L, 5L, 0L, 0L),    // -> 01-1-005
      (1L, 123L, 9L, 4L),  // -> 10-5-123
      (1L, 77L, 3L, 2L),   // -> 04-3-077
      (2L, 8L, 2L, 1L),    // -> 3-2-8
      (2L, 9L, 0L, 0L)     // -> 1-1-9
    ).toDF("video", "spot", "frame", "track")
    val got = RoiName.filenames(df, col("video"), col("track"),
        col("frame"), col("spot"))
      .select("video", "spot", "cell_id", "frame_id", "roi_filename")
      .as[(Long, Long, Long, Long, String)].collect().toSet
    assert(got === Set(
      (1L, 5L, 1L, 1L, "01-1-005"),
      (1L, 123L, 5L, 10L, "10-5-123"),
      (1L, 77L, 3L, 4L, "04-3-077"),
      (2L, 8L, 2L, 3L, "3-2-8"),
      (2L, 9L, 1L, 1L, "1-1-9")))
    // pads never truncate: every value fits its own column's max width
    got.foreach { case (_, s, c, f, n) =>
      assert(n.split("-").map(_.toLong).toSeq === Seq(f, c, s))
    }
  }
}
