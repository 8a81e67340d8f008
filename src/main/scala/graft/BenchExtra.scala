package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Extra benchmarking / plan-inspection harness (guide §1.4/§1.5) —
  * SEPARATE from the frozen driver-contract Bench. Used for the
  * optimization rounds' noop-sink isolation, per-stage event-log
  * analysis, and committed explain("formatted") dumps.
  *
  * Usage (env):
  *   SPARK_GRAFT_SF_DIR    testdata dir (default /root/testdata/sf0.1)
  *   SPARK_GRAFT_CPUS      local[N] (default 4)
  *   GRAFT_EXTRA_QUERIES   comma list or "all" (default all)
  *   GRAFT_EXTRA_PLANS     dir to write <query>.txt formatted plans
  *   GRAFT_EXTRA_EVENTLOG  dir to enable spark event logs (stage timing)
  *   GRAFT_EXTRA_WARMUPS   untimed passes first (default 2)
  *   GRAFT_EXTRA_REPS      timed passes, min reported (default 2)
  */
object BenchExtra {

  private def session(cpus: Int): SparkSession = {
    val parts = sys.env.get("SPARK_GRAFT_SHUFFLE_PARTITIONS")
      .map(_.toInt).getOrElse(math.max(cpus, 8))
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("spark.sql.maxPlanStringLength", "100000000")
      .config("spark.ui.enabled", "false")
    val withLog = sys.env.get("GRAFT_EXTRA_EVENTLOG") match {
      case Some(dir) =>
        b.config("spark.eventLog.enabled", "true")
          .config("spark.eventLog.dir", dir)
      case None => b
    }
    val s = withLog.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def exec(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val only = sys.env.getOrElse("GRAFT_EXTRA_QUERIES", "all")
    val plansDir = sys.env.get("GRAFT_EXTRA_PLANS")
    val warmups = sys.env.getOrElse("GRAFT_EXTRA_WARMUPS", "2").toInt
    val reps = sys.env.getOrElse("GRAFT_EXTRA_REPS", "2").toInt
    val names = only.split(',').map(_.trim).filter(_.nonEmpty).toSet
    val spark = session(cpus)
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only == "all" || names(n) }

    plansDir.foreach { d => new java.io.File(d).mkdirs() }

    val results = ordered.map { case (name, fn) =>
      spark.sparkContext.setJobDescription(s"$name")
      // plan dump from a fresh build (pre-execution, AQE initial plan)
      val planLen = plansDir.map { d =>
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        val w = new java.io.PrintWriter(s"$d/$name.txt", "UTF-8")
        try w.write(txt) finally w.close()
        spark.catalog.clearCache()
        txt.length
      }.getOrElse(-1)
      (1 to warmups).foreach { _ =>
        try exec(fn(spark, sfDir)) catch { case _: Throwable => () }
        spark.catalog.clearCache()
      }
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { exec(fn(spark, sfDir)); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench-extra] $name failed: ${e.getMessage}")
          false
        }
        spark.catalog.clearCache()
        if (ok) (System.nanoTime() - t0) / 1e9 else Double.NaN
      }
      spark.sparkContext.setJobDescription(null)
      (name, times.filterNot(_.isNaN), planLen)
    }
    results.foreach { case (name, ts, planLen) =>
      val best = if (ts.isEmpty) -1.0 else ts.min
      val all = ts.map(t => f"$t%.3f").mkString(",")
      println(f"[bench-extra] $name%-28s best=$best%8.3f s  runs=[$all]" +
        (if (planLen >= 0) s"  plan_chars=$planLen" else ""))
    }
    spark.stop()
  }
}
