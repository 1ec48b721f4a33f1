package graft

import org.apache.spark.sql.functions._

import graft.operators.Interaction

class InteractionSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, Long, Double, Double)],
                  maxDist: Double, minShared: Int = 3) =
    Interaction.pairs(rows.toDF("t", "f", "x", "y"),
        col("t"), col("f"), col("x"), col("y"), maxDist, minShared)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap

  test("lockstep neighbors score +1, anti-aligned score -1") {
    // track 1 and 2: parallel unit steps, 1 apart; track 3 mirrors
    // track 1's motion exactly reversed from nearby start
    val rows = (0L to 5L).flatMap { f =>
      Seq((1L, f, f.toDouble, 0.0), (2L, f, f.toDouble, 1.0),
        (3L, f, -f.toDouble, 2.0))
    }
    val got = run(rows, maxDist = 2.5)
    assert(got((1L, 2L)) == ((5L, 1.0, 1.0)))
    // 1 and 3 share frame 0 within 2.5 (dist 2), then diverge
    assert(got((1L, 3L))._3 == -1.0)
  }

  test("distance gates candidacy; minShared gates output") {
    val near = (0L to 5L).flatMap { f =>
      Seq((1L, f, f.toDouble, 0.0), (2L, f, f.toDouble, 1.0)) }
    val far = (0L to 5L).map { f => (9L, f, f.toDouble, 100.0) }
    val got = run(near ++ far, maxDist = 2.0)
    assert(!got.keySet.exists { case (a, b) => a == 9L || b == 9L })
    // a pair sharing only 2 step frames misses minShared = 3
    val short = (0L to 2L).flatMap { f =>
      Seq((5L, f, f.toDouble, 50.0), (6L, f, f.toDouble, 51.0)) }
    val got2 = run(near ++ short, maxDist = 2.0, minShared = 3)
    assert(!got2.contains((5L, 6L)))
    assert(run(near ++ short, maxDist = 2.0, minShared = 2).contains((5L, 6L)))
  }

  test("grid candidates equal the naive same-frame distance join") {
    // deterministic pseudo-random walk cloud
    val rows = (0 until 200).map { i =>
      val t = (i % 20).toLong
      val f = (i / 20).toLong
      val h = (i * 2654435761L) & 0xffff
      (t, f, (h % 97).toDouble / 7.0, ((h / 97) % 89).toDouble / 7.0)
    }
    val df = rows.toDF("t", "f", "x", "y")
    val maxDist = 1.5
    val got = Interaction.pairs(df, col("t"), col("f"), col("x"), col("y"),
        maxDist, minShared = 1)
      .select("u1", "u2").as[(Long, Long)].collect().toSet
    // naive: every pair within maxDist at some frame, with >= 1 shared
    // step frame
    val naive = df.as("a").join(df.as("b"),
        col("a.f") === col("b.f") && col("a.t") < col("b.t"))
      .filter(pow(col("a.x") - col("b.x"), 2) + pow(col("a.y") - col("b.y"), 2)
        <= maxDist * maxDist)
      .select(col("a.t").as("u1"), col("b.t").as("u2")).distinct()
      .as[(Long, Long)].collect().toSet
    // tracks with >= 2 frames always have a step at every frame > 0,
    // so every naive pair with a shared frame > 0 appears; got must
    // never exceed naive
    assert(got.subsetOf(naive))
    val stepPairs = naive // all tracks here span 10 frames
    assert((stepPairs -- got).forall { case (u1, u2) =>
      // a missing pair can only be one whose ONLY near frame was
      // frame 0 for... no: candidacy is per ANY near frame, shared
      // steps exist for all 10-frame tracks — nothing may be missing
      false
    }, s"missing pairs: ${stepPairs -- got}")
  }

  test("degenerate-dense cell fails fast at maxCellOccupancy") {
    // all spots of each frame inside a single maxDist cell: the
    // quadratic-candidate shape the cap exists to refuse (two frames,
    // so steps exist and the candidate join is genuinely consumed —
    // an empty phase-2 side would let AQE skip phase 1 entirely)
    val dense = (0L to 1L).flatMap { f =>
      (0 until 40).map { i =>
        (i.toLong, f, (i % 7).toDouble / 100.0 + f, (i / 7).toDouble / 100.0) } }
    val df = dense.toDF("t", "f", "x", "y")
    val e = intercept[Exception] {
      Interaction.pairs(df, col("t"), col("f"), col("x"), col("y"),
        maxDist = 10.0, minShared = 1, maxCellOccupancy = 16).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("maxCellOccupancy")), s"wrong error: $e")
    // the same data passes (and still scores pairs) once the cap
    // admits the cell
    val ok = Interaction.pairs(df, col("t"), col("f"), col("x"), col("y"),
      maxDist = 10.0, minShared = 1, maxCellOccupancy = 64)
    assert(ok.count() > 0)
  }

  test("q_interact runs and matches its own determinism") {
    val a = SparkEntry.queries("q_interact")(spark, sfDir).collect()
    val b = SparkEntry.queries("q_interact")(spark, sfDir).collect()
    assert(a.nonEmpty, "no interacting pairs at sf0.001 — tune maxDist")
    assert(a.map(_.toString).sorted.toSeq == b.map(_.toString).sorted.toSeq)
  }
}
