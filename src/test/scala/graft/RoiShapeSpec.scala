package graft

import org.apache.spark.sql.functions._
import graft.operators.RoiShape

class RoiShapeSpec extends SparkSpec {
  import spark.implicits._

  private def feats(polys: Seq[(Long, Seq[(Double, Double)])]) = {
    val df = polys.toDF("id", "pts")
      .withColumn("roi", transform(col("pts"),
        p => struct(p.getField("_1").as("x"), p.getField("_2").as("y"))))
    RoiShape.features(df, col("roi"))
      .select("id", "n_vertices", "area", "perimeter", "circularity",
        "bbox_w", "bbox_h", "aspect")
      .as[(Long, Int, Double, Double, Double, Double, Double, Double)]
      .collect().sortBy(_._1).toList
  }

  test("hand-computed polygons: unit square and 3-4-5 triangle") {
    val got = feats(Seq(
      (1L, Seq((0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0))),
      (2L, Seq((0.0, 0.0), (4.0, 0.0), (0.0, 3.0)))))
    val (_, n1, a1, p1, c1, w1, h1, asp1) = got.head
    assert(n1 == 4 && a1 == 1.0 && p1 == 4.0 && w1 == 1.0 && h1 == 1.0 && asp1 == 1.0)
    assert(math.abs(c1 - math.Pi / 4.0) < 1e-12)
    val (_, n2, a2, p2, c2, w2, h2, asp2) = got(1)
    assert(n2 == 3 && a2 == 6.0 && p2 == 12.0 && w2 == 4.0 && h2 == 3.0)
    assert(math.abs(asp2 - 4.0 / 3.0) < 1e-12)
    assert(math.abs(c2 - math.Pi / 6.0) < 1e-12)
  }

  test("vertex order does not change area; clockwise winding is absolute") {
    val ccw = feats(Seq((1L, Seq((0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0)))))
    val cw = feats(Seq((1L, Seq((0.0, 2.0), (2.0, 2.0), (2.0, 0.0), (0.0, 0.0)))))
    assert(ccw.head._3 == 4.0 && cw.head._3 == 4.0)
  }

  test("degenerate polygons: single point and collinear segment") {
    val got = feats(Seq(
      (1L, Seq((5.0, 5.0))),
      (2L, Seq((0.0, 0.0), (3.0, 0.0)))))
    val p1 = got.head
    assert(p1._3 == 0.0 && p1._4 == 0.0 && p1._5 == 0.0 && p1._8 == 0.0)
    val seg = got(1)
    assert(seg._3 == 0.0 && seg._4 == 6.0 && seg._6 == 3.0 && seg._7 == 0.0)
  }

  test("synthetic ROI construction is deterministic and in-range") {
    val df = graft.sources.Ingest.eventsTyped(Tables.events(spark, sfDir))
      .withColumn("roi", RoiShape.syntheticRoi(col("event_id"), col("value"), col("y")))
    val r = RoiShape.features(df, col("roi"))
      .select("n_vertices", "area", "perimeter")
      .as[(Int, Double, Double)].collect()
    assert(r.nonEmpty)
    r.foreach { case (k, a, p) =>
      assert(k >= 4 && k <= 8)
      assert(a > 0.0 && p > 0.0)
    }
  }
}
