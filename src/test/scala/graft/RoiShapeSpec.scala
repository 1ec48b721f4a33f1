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

private def tmFeats(polys: Seq[(Long, Seq[(Double, Double)])]) = {
    val df = polys.toDF("id", "pts")
      .withColumn("roi", transform(col("pts"),
        p => struct(p.getField("_1").as("x"), p.getField("_2").as("y"))))
    RoiShape.trackmateDescriptors(df, col("roi"))
      .select("id", "area", "perimeter", "shape_index", "radius", "solidity")
      .as[(Long, Double, Double, Double, Double, Double)]
      .collect().sortBy(_._1).toList
  }

  test("TrackMate descriptors: shape index, equivalent radius, solidity " +
      "on hand cases (convex == 1, concave < 1)") {
    val got = tmFeats(Seq(
      // unit square: convex, solidity exactly 1
      (1L, Seq((0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0))),
      // dart (concave quad): hull is the (0,0)(4,0)(2,3) triangle
      // (area 6); the dart's own area = 6 - area of the notch
      // triangle (0,0)(4,0)(2,1) = 6 - 2 = 4 -> solidity 4/6
      (2L, Seq((0.0, 0.0), (2.0, 1.0), (4.0, 0.0), (2.0, 3.0))),
      // degenerate: collinear -> solidity 0 by contract
      (3L, Seq((0.0, 0.0), (1.0, 0.0), (2.0, 0.0)))))
    val (_, a1, p1, si1, r1, s1) = got.head
    assert(a1 == 1.0 && p1 == 4.0)
    assert(math.abs(si1 - 4.0) < 1e-12, "P/sqrt(A) of the unit square is 4")
    assert(math.abs(r1 - math.sqrt(1.0 / math.Pi)) < 1e-12)
    assert(math.abs(s1 - 1.0) < 1e-12, "a convex polygon has solidity 1")
    val (_, a2, _, si2, _, s2) = got(1)
    assert(a2 == 4.0)
    assert(math.abs(si2 - got(1)._3 / math.sqrt(4.0)) < 1e-12)
    assert(math.abs(s2 - 4.0 / 6.0) < 1e-12, s"dart solidity, got $s2")
    assert(got(2)._6 == 0.0, "degenerate hulls report solidity 0")
  }

  test("solidity equals a brute-force hull on the synthetic ROI corpus; " +
      "vertex order cannot change it") {
    // independent hull: gift wrapping (Jarvis march) over the vertex
    // set — O(n*h) but n <= 8 here; areas via the shoelace
    def bruteHullArea(pts: Seq[(Double, Double)]): Double = {
      val d = pts.distinct
      if (d.length < 3) return 0.0
      val start = d.minBy(p => (p._1, p._2))
      def cross(o: (Double, Double), a: (Double, Double), b: (Double, Double)) =
        (a._1 - o._1) * (b._2 - o._2) - (a._2 - o._2) * (b._1 - o._1)
      val hull = scala.collection.mutable.ArrayBuffer(start)
      var cur = start
      var guard = 0
      while (guard <= d.length) {
        var next = d.find(_ != cur).get
        d.foreach { c =>
          if (c != cur) {
            val t = cross(cur, next, c)
            val dn = math.hypot(next._1 - cur._1, next._2 - cur._2)
            val dc = math.hypot(c._1 - cur._1, c._2 - cur._2)
            if (t < 0 || (t == 0 && dc > dn)) next = c
          }
        }
        if (next == start) guard = d.length + 1
        else { hull += next; cur = next; guard += 1 }
      }
      val h = hull.toSeq
      if (h.length < 3) 0.0
      else math.abs(h.indices.map { i =>
        val j = (i + 1) % h.length
        h(i)._1 * h(j)._2 - h(j)._1 * h(i)._2
      }.sum) / 2.0
    }
    val ev = graft.sources.Ingest.eventsTyped(Tables.events(spark, sfDir))
      .limit(500)
      .withColumn("roi", RoiShape.syntheticRoi(col("event_id"), col("value"), col("y")))
    val rows = RoiShape.trackmateDescriptors(ev, col("roi"))
      .select(col("event_id"), col("area"), col("solidity"),
        transform(col("roi"), v =>
          struct(v.getField("x"), v.getField("y"))).as("pts"))
      .as[(Long, Double, Double, Seq[(Double, Double)])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, area, sol, pts) =>
      val want = area / bruteHullArea(pts)
      assert(math.abs(sol - want) < 1e-9, s"event $id: $sol vs $want")
      assert(sol > 0.0 && sol <= 1.0 + 1e-12, s"event $id solidity $sol")
      // shuffled vertex order: the hull (a set property) is unchanged
      val shuffled = scala.util.Random.shuffle(pts.toList)
      assert(math.abs(bruteHullArea(shuffled) - bruteHullArea(pts)) < 1e-9)
    }
  }
}
