package graft

import org.apache.spark.sql.functions._

import graft.multimodal.{ImageJRoi, ImageJRoiEncode}

class ImageJRoiSpec extends SparkSpec {
  import spark.implicits._

  private def encode(pts: Seq[(Long, Long)]): Array[Byte] =
    Seq(Tuple1(pts)).toDF("v")
      .select(transform(col("v"),
        p => struct(p("_1").as("x"), p("_2").as("y"))).as("outline"))
      .select(ImageJRoiEncode(col("outline")).as("b"))
      .as[Array[Byte]].head()

  test("header bytes are the ImageJ layout, hand-checked") {
    val b = encode(Seq((5L, 3L), (9L, 3L), (9L, 7L), (5L, 7L)))
    assert(new String(b.take(4), "US-ASCII") === "Iout")
    assert(((b(4) << 8) | (b(5) & 0xff)) === 228)  // version
    assert(b(6) === 0)                              // polygon type
    assert(((b(8) << 8) | (b(9) & 0xff)) === 3)     // top = minY
    assert(((b(10) << 8) | (b(11) & 0xff)) === 5)   // left = minX
    assert(((b(16) << 8) | (b(17) & 0xff)) === 4)   // n vertices
    assert(b.length === 64 + 4 * 4)
  }

  test("encode/decode round-trips vertices in order") {
    val pts = Seq((12L, 40L), (20L, 41L), (18L, 55L), (11L, 50L), (12L, 44L))
    val (tpe, top, left, bottom, right, got) = ImageJRoi.decode(encode(pts))
    assert(tpe === 0 && top === 40 && left === 11 && bottom === 56 && right === 21)
    assert(got === pts)
  }

  test("the full chain: XML ROIs -> boundary fill -> roi payloads") {
    val xml =
      """<Model><AllSpots nspots="1"><SpotsInFrame frame="0">""" +
      """<Spot ID="1" name="ID1" FRAME="0" POSITION_X="10" POSITION_Y="11">-2.0 -2.0 2.0 -2.0 2.0 2.0 -2.0 2.0</Spot>""" +
      """</SpotsInFrame></AllSpots><AllTracks/></Model>"""
    val model = graft.sources.XmlIngest.parse(
      Seq((1L, xml)).toDF("video", "doc"), col("video"), col("doc"))
    val payloads = graft.sources.XmlIngest.rois(model)
      .select(ImageJRoiEncode(
        graft.functions.BoundaryFill(col("roi"))).as("payload"))
      .as[Array[Byte]].collect()
    assert(payloads.length === 1)
    val (tpe, top, left, bottom, right, pts) = ImageJRoi.decode(payloads.head)
    // a 4x4 square at (8..12, 9..13): 16 boundary pixels
    assert(tpe === 0 && left === 8 && top === 9 && right === 13 && bottom === 14)
    assert(pts.size === 16 && pts.distinct === pts)
  }
}
