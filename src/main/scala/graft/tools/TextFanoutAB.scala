package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scratch: interleaved A/B of tText fan-out sizings within ONE session
  * (graft.text.splitBytes / capWaves are runtime confs). For each heavy
  * text query: warmups, then alternating A/B reps; reports best per
  * config. */
object TextFanoutAB {
  private def exec(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val s = SparkSession.builder()
      .master("local[32]")
      .appName("text-fanout-ab")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("spark.sql.maxPlanStringLength", "100000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val names = Seq("q_minhash_neardups", "q_neardup_incremental",
      "q_simhash_neardups", "q_span_dedup", "q_repetition",
      "q_quality_features", "q_decontaminate", "q_redact_pii")
    val configs = Seq(
      ("A:32k/1w", "32768", "1"),
      ("B:8k/4w", "8192", "4"))
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      // warm both configs once
      configs.foreach { case (_, sb, cw) =>
        s.conf.set("graft.text.splitBytes", sb)
        s.conf.set("graft.text.capWaves", cw)
        try exec(fn(s, sfDir)) catch { case _: Throwable => () }
        s.catalog.clearCache()
      }
      val best = scala.collection.mutable.Map[String, Double]()
      (1 to reps).foreach { _ =>
        configs.foreach { case (tag, sb, cw) =>
          s.conf.set("graft.text.splitBytes", sb)
          s.conf.set("graft.text.capWaves", cw)
          val t0 = System.nanoTime()
          exec(fn(s, sfDir))
          val t = (System.nanoTime() - t0) / 1e9
          s.catalog.clearCache()
          best(tag) = math.min(best.getOrElse(tag, Double.MaxValue), t)
        }
      }
      println(f"[ab] $n%-24s " + configs.map { case (tag, _, _) =>
        f"$tag=${best(tag)}%6.3f" }.mkString("  "))
    }
    s.stop()
  }
}
