package graft

import org.apache.spark.sql.functions._
import graft.operators._

class MovementSpec extends SparkSpec {
  import spark.implicits._

  test("movement features match hand computation on a 3-step track") {
    // one entity at (0,0) -> (3,4) -> (3,8): steps 5 then 4
    val df = Seq(
      (1L, 10L, 100L, 0.0, 0.0),
      (1L, 11L, 110L, 3.0, 4.0),
      (1L, 12L, 130L, 3.0, 8.0)
    ).toDF("user_id", "event_id", "ts_s", "x", "y")
    val got = Movement.features(df, "user_id", col("event_id"), col("ts_s"),
        col("x"), col("y"), framerate = 1.0)
      .select("event_id", "dis", "trac", "d2t", "vel")
      .orderBy("event_id").as[(Long, Double, Double, Double, Double)].collect()
    assert(got(0) == ((10L, 0.0, 0.0, 0.0, 0.0)))
    assert(got(1) == ((11L, 5.0, 5.0, 1.0, 0.5)))          // dt=10 -> vel 5/10
    val (_, dis2, trac2, d2t2, vel2) = got(2)
    assert(math.abs(dis2 - math.sqrt(9 + 64)) < 1e-12)
    assert(trac2 == 9.0 && math.abs(d2t2 - dis2 / 9.0) < 1e-12 && vel2 == 0.2)
  }
}

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  test("new session after gap > threshold") {
    val df = Seq((1L, 1L, 0L), (1L, 2L, 100L), (1L, 3L, 5000L), (2L, 4L, 0L))
      .toDF("user_id", "event_id", "ts_s")
    val got = Sessionize(df, "user_id", col("event_id"), col("ts_s"), 1000L)
      .select("event_id", "session_id").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
  }
}

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  test("multi-variable elevation: one window shuffle for all variables") {
    val df = Seq((1L, 1L, 1.0, 10.0), (1L, 2L, 3.0, 8.0), (1L, 3L, 2.0, 9.0))
      .toDF("user_id", "event_id", "a", "b")
    val r = TimeSeries.elevationMulti(df, "user_id", col("event_id"),
      Seq("a" -> col("a"), "b" -> col("b")))
    val rows = r.select("n_obs", "a_ascent", "a_descent", "b_ascent", "b_descent")
      .as[(Long, Double, Double, Double, Double)].collect()
    assert(rows.toSeq == Seq((3L, 2.0, 1.0, 1.0, 2.0)))
    val plan = r.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected ONE shuffle for all variables:\n" + plan.take(1200))
  }

  test("elevation: ascent/descent on 1,3,2,5") {
    val df = Seq((1L, 1L, 1.0), (1L, 2L, 3.0), (1L, 3L, 2.0), (1L, 4L, 5.0))
      .toDF("user_id", "event_id", "value")
    val r = TimeSeries.elevation(df, "user_id", col("event_id"), col("value"))
      .select("n_obs", "ascent", "descent", "max_v", "min_v", "range_v")
      .as[(Long, Double, Double, Double, Double, Double)].head()
    assert(r == ((4L, 5.0, 1.0, 5.0, 1.0, 4.0)))
  }

  test("haar level-1/2 energies on 4,2,6,8") {
    // pairs: d1 = (4-2)/r2, (6-8)/r2 -> d1^2 = 2, 2 -> l1 = 2
    // a1 = 6/r2, 14/r2 ; d2 = (6/r2 - 14/r2)/r2 = -4 -> l2 = 16
    val df = Seq((1L, 1L, 4.0), (1L, 2L, 2.0), (1L, 3L, 6.0), (1L, 4L, 8.0))
      .toDF("user_id", "event_id", "value")
    val r = TimeSeries.haarEnergies(df, "user_id", col("event_id"), col("value"))
      .select("n_pairs_l1", "l1_energy", "n_pairs_l2", "l2_energy")
      .as[(Long, Double, Long, Double)].head()
    assert(r == ((2L, 2.0, 1L, 16.0)))
  }

  test("moment stats match hand computation (skew/kurtosis)") {
    // values 1,2,3,6: mean 3, var (4+1+0+9)/4 = 3.5
    // m3 = (-8 -1 +0 +27)/4 = 4.5 -> skew = 4.5 / 3.5^1.5
    // m4 = (16 + 1 + 0 + 81)/4 = 24.5 -> kurt = 24.5/12.25 - 3 = -1
    val df = Seq((1L, 1.0), (1L, 2.0), (1L, 3.0), (1L, 6.0), (2L, 7.0))
      .toDF("user_id", "value")
    val got = TimeSeries.momentStats(df, "user_id", col("value"))
      .as[(Long, Long, Double, Option[Double], Option[Double], Option[Double])]
      .collect().sortBy(_._1).toList
    val skew = 4.5 / (3.5 * math.sqrt(3.5))
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(got.head == ((1L, 4L, 3.0, Some(3.5), Some(r6(skew)), Some(-1.0))))
    // single-observation track: moments undefined
    assert(got(1) == ((2L, 1L, 7.0, None, None, None)))
  }

  test("exact per-track median: odd, even, single") {
    val df = Seq((1L, 3.0), (1L, 1.0), (1L, 2.0),          // odd: 2.0
      (2L, 4.0), (2L, 1.0), (2L, 2.0), (2L, 3.0),          // even: 2.5
      (3L, 9.0))                                           // single: 9.0
      .toDF("user_id", "value")
    val got = TimeSeries.trackMedian(df, "user_id", col("value"))
      .as[(Long, Long, Double)].collect().sortBy(_._1).toList
    assert(got == List((1L, 3L, 2.0), (2L, 4L, 2.5), (3L, 1L, 9.0)))
  }

  test("haar drops incomplete tail pair (odd length)") {
    val df = Seq((1L, 1L, 4.0), (1L, 2L, 2.0), (1L, 3L, 9.0))
      .toDF("user_id", "event_id", "value")
    val r = TimeSeries.haarEnergies(df, "user_id", col("event_id"), col("value"))
      .select("n_pairs_l1", "n_pairs_l2").as[(Long, Long)].head()
    assert(r == ((1L, 0L)))
  }
}

class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("filterSizeAndObservations mirrors filter + group-count filter") {
    val df = Seq((1L, 5.0), (1L, 20.0), (1L, 30.0), (2L, 25.0))
      .toDF("user_id", "value").withColumn("event_id", col("value").cast("long"))
    // minSize 10 drops (1,5); minObs 2 then drops user 2
    val got = Quality.filterSizeAndObservations(df, "user_id", col("value"), 10.0, 2L)
      .select("user_id", "value").as[(Long, Double)].collect().sorted
    assert(got.toSeq == Seq((1L, 20.0), (1L, 30.0)))
  }

  test("duplicates finds multi-observation (entity, frame) pairs") {
    val df = Seq((1L, 10L), (1L, 10L), (1L, 11L), (2L, 10L)).toDF("user_id", "frame_v")
    val got = Quality.duplicates(df, "user_id", col("frame_v"))
      .select("user_id", "frame", "n").as[(Long, Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 10L, 2L)))
  }
}

class DensitySpec extends SparkSpec {
  import spark.implicits._

  test("grid bins and counts") {
    val df = Seq(("a", 5.0, 3.0), ("a", 15.0, 3.0), ("a", 17.0, 4.0), ("b", 5.0, 3.0))
      .toDF("event_type", "x", "y")
    val got = Density.grid(df, Seq(col("event_type")), col("x"), col("y"), 10.0, 10.0)
      .select("event_type", "gx", "gy", "n").as[(String, Long, Long, Long)]
      .collect().toSet
    assert(got == Set(("a", 0L, 0L, 1L), ("a", 1L, 0L, 2L), ("b", 0L, 0L, 1L)))
  }
}
