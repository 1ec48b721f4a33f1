package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Timelapse INPUT NORMALIZATION — the reference workflow's first
  * stage (main.nf:406-466): a raw acquisition directory may hold any
  * of four shapes, and everything downstream keys on one canonical
  * form, "one file per frame named `frame_%05d.tiff`". The dispatch,
  * with the reference's exact precedence:
  *
  *  1. OME-TIFF (an `*companion.ome*` XML present): the companion's
  *     `Image/Pixels/TiffData` elements are the frame manifest —
  *     each carries the member file (`UUID@FileName`), the page
  *     inside it (`@IFD`) and the global frame index (`@FirstT`),
  *     exactly the three xpath extractions of
  *     `ome_get_filename`/`ome_get_frame_t`/`ome_get_global_t`;
  *     frames order by FirstT (split_ome_frames names its output by
  *     the zero-padded global index, so the later natural sort IS
  *     FirstT order);
  *  2. JPEGs: one frame per file, extension rewritten to `.tiff`
  *     keeping the basename (`convert_jpeg`'s %[basename]);
  *  3. a SINGLE multi-page TIFF: pages 0..n-1 explode to one frame
  *     each (`tiffsplit`'s alphabetical part names = page order);
  *  4. MANY TIFFs: already one per frame.
  *
  * Then the naming contract: spaces scrub to underscores
  * (`remove_spaces`), files NATURAL-SORT by name (`natsorted` —
  * [[graft.functions.NaturalSortKey]] turns that into an ordinary
  * codegen'd Spark sort), and the 1-indexed rank becomes
  * `frame_%05d.tiff`.
  *
  * The pixel work itself (tiffcp/tiffsplit/magick) is codec-bound and
  * stays behind the declared multimodal decode stub; this operator
  * produces the MANIFEST those jobs consume: one row per frame with
  * (timelapse, kind, src_file, src_index, frame_id, canonical_name).
  *
  * Scale shape: one window rank per timelapse (millions of frames
  * across millions of timelapses = one shuffle by timelapse, sorted
  * within partitions); the companion XML parses once per timelapse
  * via native `from_xml` like the TrackMate ingest. */
object TimelapseIngest {

  /** Schema of the OME companion subset the reference xpaths read. */
  val OmeSchema: StructType = StructType(Seq(
    StructField("Image", StructType(Seq(
      StructField("Pixels", StructType(Seq(
        StructField("TiffData", ArrayType(StructType(Seq(
          StructField("_FirstT", LongType),
          StructField("_IFD", LongType),
          StructField("UUID", StructType(Seq(
            StructField("_FileName", StringType))))))))))))))))

  private def scrub(c: Column): Column = regexp_replace(c, " ", "_")

  private def canonical(rank: Column): Column =
    concat(lit("frame_"), lpad(rank.cast("string"), 5, "0"), lit(".tiff"))

  /** The canonical frame manifest.
    *
    * `files`: (timelapse, path, pages) — one row per RAW file; `pages`
    * is the TIFF page count (metadata, used only in the single-stack
    * case; null or 1 elsewhere). `companions`: (timelapse, xml) — the
    * OME companion document where one exists.
    *
    * Output: (timelapse, kind, src_file, src_index, frame_id,
    * canonical_name) — kind in {ome, jpeg, stack, tiffs}; src_file is
    * the SCRUBBED source name for every kind (`remove_spaces` renames
    * files before anything downstream sees them, so the scrubbed name
    * is the one the pixel jobs resolve — r15 unified the jpeg/tiffs
    * branches with ome/stack); src_index is
    * the page/IFD inside src_file (0 for one-frame files); frame_id
    * is 1-indexed in canonical order; canonical_name =
    * `frame_%05d.tiff`. */
  def manifest(files: DataFrame, companions: DataFrame): DataFrame = {
    val f = files.select(col("timelapse").cast("long").as("timelapse"),
      col("path").cast("string").as("path"),
      col("pages").cast("int").as("pages"))
    val ext = lower(regexp_extract(col("path"), "\\.([^./]+)$", 1))
    val base = regexp_extract(col("path"), "([^/]+)$", 1)
    val byTl = Window.partitionBy("timelapse")
    // ONE scan of the files table (r15 — the four-way dispatch used to
    // branch-and-union, scanning files once per kind): the dispatch
    // counts ride a window over the same timelapse partitioning the
    // frame ranking needs, so the whole non-OME path is one scan, one
    // exchange, two Window passes
    val tagged = f
      .withColumn("_base", base)
      .withColumn("_is_jpeg", ext.isin("jpg", "jpeg"))
      .withColumn("_is_tiff", ext.isin("tif", "tiff"))
      .withColumn("_njpeg",
        sum(when(col("_is_jpeg"), 1).otherwise(0)).over(byTl))
      .withColumn("_ntiff",
        sum(when(col("_is_tiff"), 1).otherwise(0)).over(byTl))
    val ome = companions.select(col("timelapse").cast("long").as("timelapse"),
        from_xml(col("xml"), OmeSchema).as("_ome"))
      .withColumn("_has_ome", lit(true))

    // OME: the companion IS the manifest; member files need no listing
    val omeFrames = ome
      .select(col("timelapse"),
        explode(col("_ome.Image.Pixels.TiffData")).as("_td"))
      .select(col("timelapse"), lit("ome").as("kind"),
        scrub(col("_td.UUID._FileName")).as("src_file"),
        coalesce(col("_td._IFD"), lit(0L)).as("src_index"),
        coalesce(col("_td._FirstT"), lit(0L)).as("_ord"))
      .withColumn("frame_id", row_number().over(
        Window.partitionBy("timelapse").orderBy(col("_ord"), col("src_index"))))
      .drop("_ord")

    // the kind-tagged union of the three file-backed shapes: jpeg
    // keeps one frame per file with the extension rewritten for the
    // sort; a single stack explodes its pages (frame order = page
    // order, as a zero-padded rank key); many tiffs keep one frame per
    // file — ranked by ONE window whose key is kind-appropriate
    val fileFrames = tagged
      .join(ome.select("timelapse", "_has_ome"), Seq("timelapse"), "left")
      .withColumn("kind",
        when(col("_has_ome"), lit(null)) // OME members come from the XML
          .when(col("_njpeg") > 0, lit("jpeg"))
          .when(col("_ntiff") === 1, lit("stack"))
          .when(col("_ntiff") > 1, lit("tiffs"))
          .otherwise(lit(null)))
      .filter(col("kind").isNotNull)
      .filter(when(col("kind") === "jpeg", col("_is_jpeg"))
        .otherwise(col("_is_tiff")))
      .withColumn("_scrub", scrub(col("_base")))
      .withColumn("_name",
        when(col("kind") === "jpeg",
          concat(regexp_replace(col("_scrub"), "\\.[^.]+$", ""), lit(".tiff")))
          .otherwise(col("_scrub")))
      .withColumn("src_index",
        explode(when(col("kind") === "stack",
            sequence(lit(0), coalesce(col("pages"), lit(1)) - 1))
          .otherwise(array(lit(0)))))
      .withColumn("_key",
        when(col("kind") === "stack",
          lpad(col("src_index").cast("string"), 20, "0"))
          .otherwise(graft.functions.NaturalSortKey(col("_name"))))
      .withColumn("frame_id", row_number().over(
        byTl.orderBy(col("_key"), col("_name"), col("src_index"))))
      .select(col("timelapse"), col("kind"), col("_scrub").as("src_file"),
        col("src_index").cast("long").as("src_index"),
        col("frame_id").cast("long").as("frame_id"))

    omeFrames.select(col("timelapse"), col("kind"), col("src_file"),
        col("src_index"), col("frame_id").cast("long").as("frame_id"))
      .unionByName(fileFrames)
      .withColumn("canonical_name", canonical(col("frame_id")))
  }
}
