package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** spark.sql.extensions wiring: a fresh session configured with
  * GraftExtensions can call the engine's expressions from plain SQL. */
class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions injects SQL functions via config") {
    // getOrCreate would silently return the shared fixture session (no
    // extensions applied) — detach the default session first, build a
    // fresh one over the existing context, and restore afterwards
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    // NOTE: `spark.sql.extensions` is STATIC conf — honored only when the
    // SparkContext is created. Tests share one context, so exercise the
    // same class through builder.withExtensions (equivalent injection
    // path); on a real cluster use the config with spark-submit.
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val row = spark.sql(
        "SELECT jaro_winkler('GARDEN', 'GAREDN') AS jw, " +
        "hamming_sim('205', '206') AS h, " +
        "normalize_ascii('  héllo ') AS n, " +
        "metaphone_sig('SMITH') AS mp, " +
        "dot_product(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS dp")
        .head()
      assert(math.abs(row.getDouble(0) - 0.9611111111111111) < 1e-12)
      assert(math.abs(row.getDouble(1) - 2.0 / 3) < 1e-12)
      assert(row.getString(2) == "HELLO")
      assert(row.getString(3).nonEmpty)
      assert(math.abs(row.getDouble(4) - 32.0) < 1e-12)
    } finally {
      // do NOT stop(): that would kill the SparkContext shared with the
      // fixture session; just restore the previous default/active session
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
