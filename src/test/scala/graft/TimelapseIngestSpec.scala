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
      List("a_100.tif", "b_9.tif", "b_10.tif", "frame2part3.tif"),
      "src_file is the scrubbed name for every kind (remove_spaces " +
        "renames before anything downstream resolves the file)")
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
    assert(t2.map(_._3) === List("shot_2.jpeg", "shot_10.JPG"),
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
    assert(got.map(_._3) === List("f_008.tif", "f_9.tif", "f_10.tif"))
  }

  test("the registry family: natural order equals numeric order when names " +
      "embed one variable-width number") {
    val names = Seq(3L, 21L, 100L, 9L, 50L).map(k => s"img $k.tif")
    val got = run(names.map(n => (7L, s"/raw/$n", None: Option[Int])))
    assert(got.map(_._3) === List("img_3.tif", "img_9.tif", "img_21.tif",
      "img_50.tif", "img_100.tif"))
  }

  test("the manifest plans ONE scan of the files table (kind-tagged " +
      "union, not a branch per input kind)") {
    val m = TimelapseIngest.manifest(Seq(
        (1L, "/raw/a 2.tif", None: Option[Int]),
        (1L, "/raw/a 10.tif", None: Option[Int]),
        (2L, "/raw/s.jpeg", None: Option[Int]),
        (3L, "/raw/stack.tif", Some(3))).toDF("timelapse", "path", "pages"),
      noXml)
    val fileScans = m.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation
          if l.output.exists(_.name == "pages") => l
    }
    assert(fileScans.length == 1,
      s"expected one files scan, got ${fileScans.length}")
    // and the fused plan still dispatches all three file-backed kinds
    val kinds = m.select("timelapse", "kind").distinct()
      .as[(Long, String)].collect().toMap
    assert(kinds == Map(1L -> "tiffs", 2L -> "jpeg", 3L -> "stack"))
  }

  // ---- natsort tuple-model parity for the sortable key itself ----

  /** Reference model of Python natsort's default ordering: names
    * tokenize into alternating (text, number, text, ...) tuples — a
    * leading empty text keeps positions type-aligned when a name
    * starts with a digit — compared element-wise, the shorter tuple
    * winning a tie (tuple semantics). */
  private def natTokens(s: String): Vector[Either[String, BigInt]] = {
    val runs = "([0-9]+|[^0-9]+)".r.findAllIn(s).toVector
    val toks = runs.map(r =>
      if (r.head.isDigit) Right(BigInt(r)): Either[String, BigInt]
      else Left(r): Either[String, BigInt])
    if (toks.headOption.exists(_.isRight)) Left("") +: toks else toks
  }

  private def natLess(a: String, b: String): Boolean = {
    val (ta, tb) = (natTokens(a), natTokens(b))
    ta.zip(tb).iterator.map {
      case (Left(x), Left(y)) => x.compare(y)
      case (Right(x), Right(y)) => x.compare(y)
      case _ => fail(s"misaligned tuple types for '$a' vs '$b'")
    }.find(_ != 0).map(_ < 0).getOrElse(ta.length < tb.length)
  }

  private def keyOf(s: String): String =
    graft.functions.NaturalSortKey.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(s)).toString

  test("the sortable key reproduces natsort's tuple comparison at text/" +
      "digit boundaries: 'img2.tiff' before 'img.tiff' (punctuation below " +
      "'0' must not decide)") {
    // the advisor's edge: natsort compares ("img", 2, ".tiff") against
    // ("img.tiff",) — the shorter first element wins, so img2 sorts
    // first; a bare zero-pad would have let '.' < '0' flip it
    assert(keyOf("img2.tiff") < keyOf("img.tiff"))
    assert(natLess("img2.tiff", "img.tiff"))

    val tricky = List("img.tiff", "img2.tiff", "img10.tiff", "img_3.tiff",
      "a.b", "a1.b", "a 2.b", "2start.tif", ".dot2", "b-1.tif", "b.tif",
      "frame_9.tiff", "frame_10.tiff", "f008.tif", "f9x.tif", "x", "x0")
    val byKey = tricky.sortBy(keyOf)
    val byModel = tricky.sortWith(natLess)
    assert(byKey === byModel,
      s"key order must equal the natsort tuple model; key=$byKey model=$byModel")
  }
}
