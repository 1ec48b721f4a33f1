package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM, one session). */
object TestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(Tables.NanosConf._1, Tables.NanosConf._2)
      .config("spark.sql.warehouse.dir", "/tmp/graft_test_warehouse")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSession.spark
  val testdataRoot = "/root/testdata"
  val sfDir = s"$testdataRoot/sf0.001"
  /** The larger scale point for the few specs that need a regime the
    * tiny default can't produce; `assume` on this so such specs skip
    * cleanly (not fail) on a checkout without the bigger dataset. */
  val sfDirBig = s"$testdataRoot/sf0.1"
}
