package graft

import org.apache.spark.sql.functions._

import graft.sources.TimelapseIngest

/** Timelapse input normalization: the four-way format dispatch with
  * the reference's precedence, the OME companion manifest, and the
  * natural-sort + space-scrub `frame_%05d.tiff` naming contract. */
class TimelapseIngestSpec extends SparkSpec {
  import spark.implicits._

  private def noXml = Seq.empty[(Long, String)].toDF("timelapse", "xml")

  private def run(files: Seq[(Long, String, Option[Int])],
                  xml: org.apache.spark.sql.DataFrame = null) =
    TimelapseIngest.manifest(
        files.toDF("timelapse", "path", "pages"),
        if (xml == null) noXml else xml)
      .select("timelapse", "kind", "src_file", "src_index", "frame_id",
        "canonical_name")
      .as[(Long, String, String, Long, Long, String)]
      .collect().sortBy(r => (r._1, r._5)).toList

  test("natural sort + space scrub: 9 before 10, numbers before letters, " +
      "canonical zero-padded names") {
    val got = run(Seq(
      (1L, "/raw/b 10.tif", None), (1L, "/raw/b 9.tif", None),
      (1L, "/raw/a 100.tif", None), (1L, "/raw/frame2part3.tif", None)))
    assert(got.map(_._3) ===
      List("a 100.tif", "b 9.tif", "b 10.tif", "frame2part3.tif"))
    assert(got.map(_._6) === List("frame_00001.tiff", "frame_00002.tiff",
      "frame_00003.tiff", "frame_00004.tiff"))
    assert(got.forall(_._2 == "tiffs"))
    // lexicographic order would have put "b 10" before "b 9"
  }

  test("dispatch precedence: OME beats JPEGs beats a single stack beats TIFFs") {
    val ome = """<OME><Image><Pixels>
      <TiffData FirstT="1" IFD="0"><UUID FileName="t 2.ome.tiff"/></TiffData>
      <TiffData FirstT="0" IFD="3"><UUID FileName="t 1.ome.tiff"/></TiffData>
      </Pixels></Image></OME>"""
    val xml = Seq((1L, ome)).toDF("timelapse", "xml")
    val got = run(Seq(
      // timelapse 1 has a companion: its tiffs are OME members, the
      // manifest comes from the XML (ordered by FirstT, files scrubbed)
      (1L, "/raw/t 1.ome.tiff", None), (1L, "/raw/t 2.ome.tiff", None),
      // timelapse 2 has jpegs AND tiffs: jpeg wins
      (2L, "/raw/shot 2.jpeg", None), (2L, "/raw/shot 10.JPG", None),
      // timelapse 3: one tiff = a stack of 3 pages
      (3L, "/raw/stack.tif", Some(3))), xml)
    val t1 = got.filter(_._1 == 1L)
    assert(t1.map(r => (r._2, r._3, r._4, r._5)) === List(
      ("ome", "t_1.ome.tiff", 3L, 1L), ("ome", "t_2.ome.tiff", 0L, 2L)),
      s"OME manifest must order by FirstT; got $t1")
    val t2 = got.filter(_._1 == 2L)
    assert(t2.forall(_._2 == "jpeg"))
    assert(t2.map(_._3) === List("shot 2.jpeg", "shot 10.JPG"),
      "natural sort on the converted-scrubbed names: 2 before 10")
    val t3 = got.filter(_._1 == 3L)
    assert(t3.map(r => (r._2, r._4, r._5)) ===
      List(("stack", 0L, 1L), ("stack", 1L, 2L), ("stack", 2L, 3L)))
    assert(t3.forall(_._3 == "stack.tif"))
  }

  test("leading zeros parse as values (007 == 7 class), ties broken " +
      "deterministically on the raw name") {
    val got = run(Seq(
      (1L, "/raw/f 008.tif", None), (1L, "/raw/f 9.tif", None),
      (1L, "/raw/f 10.tif", None)))
    assert(got.map(_._3) === List("f 008.tif", "f 9.tif", "f 10.tif"))
  }

  test("the registry family: natural order equals numeric order when names " +
      "embed one variable-width number") {
    val names = Seq(3L, 21L, 100L, 9L, 50L).map(k => s"img $k.tif")
    val got = run(names.map(n => (7L, s"/raw/$n", None: Option[Int])))
    assert(got.map(_._3) === List("img 3.tif", "img 9.tif", "img 21.tif",
      "img 50.tif", "img 100.tif"))
  }
}
