package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.NanosConf._1, Tables.NanosConf._2)
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up JIT/codegen/parquet-footer caches so the first timed query
    // doesn't absorb one-time session costs.
    Seq("lineitem", "events", "documents", "embeddings")
      .foreach(t => Tables.load(spark, sfDir, t).count())
    spark.range(1000000).selectExpr("sum(id)").collect()
    // steady-state timing: best of 2 runs per query (first run absorbs
    // per-plan codegen/compile; at 100 TB amortized to nothing).
    // The noop sink consumes every output column, so Catalyst cannot
    // prune the computed projections the way it can under count();
    // failures are reported loudly (stderr + sentinel -1), never timed.
    // optional comma-separated query filter for local iteration; the
    // driver sets no filter and times the full registry
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); true }
          catch {
            case e: Throwable =>
              System.err.println(s"BENCH FAILURE $name: $e")
              e.printStackTrace()
              false
          }
        val dt = (System.nanoTime() - t0) / 1e9
        // operators persist reused subtrees; drop them so queries are
        // timed independently and memory pressure doesn't accumulate
        spark.catalog.clearCache()
        if (ok) dt else -1.0
      }
      name -> (if (times.exists(_ >= 0)) times.filter(_ >= 0).min else -1.0)
    }.toMap
    // the driver's stdout-tail capture is ~2000 chars; a clipped line
    // is unparseable (rounds 1-3 failure mode). With 85 queries the
    // 3-decimal line hit ~2040 chars, so per-query values are 2-decimal
    // (centisecond fidelity — ranking and totals unaffected) and the sf
    // field is the directory basename. Headline total keeps 3 decimals.
    // the driver stores the LAST 2000 chars of stdout, which must hold
    // this line PLUS sbt's trailing "[success] Total time: ..." line
    // (~76 chars) — so the real budget for the JSON itself is ~1920
    // chars (the r4 line survived only because the clipping ate its
    // "[info] " prefix and stopped 8 chars short of the JSON). With an
    // 88-query registry that means 1-decimal per-query values with
    // trailing zeros stripped ("0.50" -> "0.5", "1.0" -> "1"): ~1850
    // chars, ~70 of headroom. Deciseconds are fine — ±0.05 s is within
    // local run noise anyway.
    def r1(v: Double): String =
      if (v < 0) "-1"
      else {
        val s = "%.1f".formatLocal(java.util.Locale.ROOT, v)
        val t = s.reverse.dropWhile(_ == '0').reverse
        if (t.endsWith(".")) t.dropRight(1) else t
      }
    val qs = results.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"" + k + "\":" + r1(v) }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    val sfName = new java.io.File(sfDir).getName
    println(s"""{"metric":"total","value":${r1(total)},"unit":"sec","queries":$qs,"sf":"$sfName"}""")
    spark.stop()
  }
}
