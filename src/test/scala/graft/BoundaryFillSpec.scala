package graft

import org.apache.spark.sql.functions._

class BoundaryFillSpec extends SparkSpec {
  import spark.implicits._

  private def fill(vertices: Seq[(Double, Double)]): Seq[(Long, Long)] = {
    val df = Seq(Tuple1(vertices)).toDF("v")
      .select(transform(col("v"),
        p => struct(p("_1").as("x"), p("_2").as("y"))).as("roi"))
    df.select(graft.functions.BoundaryFill(col("roi")).as("b"))
      .select(explode(col("b")).as("p")).select("p.x", "p.y")
      .as[(Long, Long)].collect().toSeq
  }

  test("a 2x2 square outline fills to its 8 boundary pixels, in walk order") {
    val got = fill(Seq((0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0)))
    assert(got === Seq((0L, 0L), (1L, 0L), (2L, 0L), (2L, 1L), (2L, 2L),
      (1L, 2L), (0L, 2L), (0L, 1L)))
  }

  test("sparse vertices interpolate: a diagonal line has no breaks") {
    val got = fill(Seq((0.0, 0.0), (5.0, 3.0), (0.0, 3.0)))
    // gaplessness: consecutive pixels (incl. the closing wrap) differ
    // by at most one step in each axis — the reference's guarantee
    (got :+ got.head).sliding(2).foreach { case Seq((x0, y0), (x1, y1)) =>
      assert(math.abs(x1 - x0) <= 1 && math.abs(y1 - y0) <= 1,
        s"gap between ($x0,$y0) and ($x1,$y1) in $got")
    }
    // endpoints present
    assert(got.contains((0L, 0L)) && got.contains((5L, 3L)) && got.contains((0L, 3L)))
    // duplicates removed, first-occurrence order kept
    assert(got.distinct === got && got.head === ((0L, 0L)))
  }

  test("random star-shaped (simple) polygons produce gapless closed outlines") {
    // self-intersecting outlines void the guarantee in the reference
    // too (dedup can only drop revisits) — segmentation ROIs are
    // simple, so star-convex samples are the honest property domain
    // fat convex blobs (evenly spaced jittered angles, one radius) —
    // cell-ROI-like; thin self-touching shapes void it in both impls
    val rnd = new scala.util.Random(7)
    (1 to 20).foreach { _ =>
      val k = 3 + rnd.nextInt(6)
      val r = 6.0 + rnd.nextInt(8)
      val verts = (0 until k).map { j =>
        val a = 2 * math.Pi * j / k + (rnd.nextDouble() - 0.5) * 0.3
        (15.0 + r * math.cos(a), 15.0 + r * math.sin(a))
      }
      val got = fill(verts)
      assert(got.nonEmpty && got.distinct === got)
      (got :+ got.head).sliding(2).foreach { case Seq((x0, y0), (x1, y1)) =>
        assert(math.abs(x1 - x0) <= 1 && math.abs(y1 - y0) <= 1,
          s"gap in outline of $verts")
      }
    }
  }

  test("fractional coordinates round to the pixel grid first") {
    val got = fill(Seq((0.4, 0.4), (1.6, 0.4), (1.6, 1.6)))
    assert(got.head === ((0L, 0L)) && got.contains((2L, 0L)) && got.contains((2L, 2L)))
  }
}
