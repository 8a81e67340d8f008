package graft.tools

import org.apache.spark.sql.SparkSession
import graft.Bench

/** Scaling-kernel probe (measurement harness, like BenchExtra — NOT part
  * of the frozen driver contract): reproduces the frozen Bench's scaling
  * kernel legs with event logs enabled, so efficiency readings can be
  * attributed at stage/task level (tools/stage_report.py). Interleaved
  * small/big rounds, same session confs as Bench's kernelSession.
  * Usage: sbt "runMain graft.tools.KernelProbe [rounds]"
  */
object KernelProbe {
  private def session(cpus: Int, logDir: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"kernel-probe-$cpus")
      .config("spark.sql.shuffle.partitions", math.max(cpus, 8))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("spark.sql.maxPlanStringLength", "100000")
      .config("spark.ui.enabled", "false")
      .config("spark.eventLog.enabled", "true")
      .config("spark.eventLog.dir", logDir)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    s
  }

  def main(args: Array[String]): Unit = {
    val logDir = "/tmp/kernel_eventlogs"
    new java.io.File(logDir).mkdirs()
    val convs = 200000
    val rounds = args.headOption.map(_.toInt).getOrElse(3)
    val results = (0 until rounds).map { r =>
      val small = session(4, logDir)
      val (np1, ts) = Bench.scoringKernelBench(small, convs, reps = 2)
      small.stop()
      val big = session(16, logDir)
      val (np, tb) = Bench.scoringKernelBench(big, convs, reps = 2)
      big.stop()
      println(f"[probe] round $r pairs=$np ts=$ts%.2f tb=$tb%.2f " +
        f"eff=${ts / tb / 4.0}%.4f thr_big=${np / tb}%.0f")
      (ts, tb)
    }
    val best = results.minBy { case (a, b) => a + b }
    println(f"[probe] best-total ts=${best._1}%.2f tb=${best._2}%.2f " +
      f"eff=${best._1 / best._2 / 4.0}%.4f")
  }
}
