package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** observe() QC counters ride the pipeline job itself — no second scan.
  * The observed row count must equal an independent count of the
  * QC-filtered input, collected from the same single action that
  * produced the pipeline output. */
class PipelineObserveSpec extends SparkSpec {

  test("pipeline observation reports QC survivor counts from the same job") {
    // fresh session: a registered Observation makes the session's
    // (non-serializable) ObservationManager reachable from closures
    // built later on the same session — MLlib model.transform then
    // fails Task-not-serializable. Isolating the observation in its
    // own session is the documented usage pattern.
    val s2 = spark.newSession()
    val ev = Tables.events(s2, sfDir)
    val obs = Observation("qc")
    val out = Pipeline.fullObserved(ev, Some(obs))
    val nTracks = out.count() // the ONE action; metrics collected as a side effect
    val m = obs.get
    val expectedRows = graft.operators.Quality
      .filterSizeAndObservations(ev, "user_id", col("value"), 10.0, 50L).count()
    assert(m("qc_rows") == expectedRows, s"observed ${m("qc_rows")} != $expectedRows")
    // approx distinct within HLL tolerance of the exact pipeline output rows
    val approxTracks = m("qc_tracks").asInstanceOf[Long]
    assert(math.abs(approxTracks - nTracks).toDouble / nTracks < 0.1,
      s"observed tracks $approxTracks vs $nTracks")
  }
}
