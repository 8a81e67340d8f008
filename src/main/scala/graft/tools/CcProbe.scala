package graft.tools

import org.apache.spark.sql.SparkSession
import graft.linkage._

/** Scratch: time Cluster.connectedComponents on the bench linkage's
  * matched-pairs edge set with event logs, to attribute per-round cost. */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val logDir = "/tmp/cc_eventlogs"
    new java.io.File(logDir).mkdirs()
    val s = SparkSession.builder()
      .master("local[32]")
      .appName("cc-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("spark.sql.maxPlanStringLength", "100000")
      .config("spark.ui.enabled", "false")
      .config("spark.eventLog.enabled", "true")
      .config("spark.eventLog.dir", logDir)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val cfg = SynthTranscripts.Config(seed = 42L, nConvs = 20000, days = 40)
    val records = Fold.fold(SynthTranscripts.transcripts(s, cfg).toDF)
      .persist()
    records.count()
    val pairs = Candidates.candidates(records, Blocking.defaultPasses)
      .persist()
    pairs.count()
    val scored = Scoring.scorePairs(records, pairs).persist()
    scored.count()
    val matched = Scoring.matches(scored).persist()
    matched.count()
    val edges = matched.select(xxhash64(col("id_a")).as("a"),
      xxhash64(col("id_b")).as("b")).persist()
    edges.count()
    (1 to 3).foreach { i =>
      s.sparkContext.setJobDescription(s"cc-run-$i")
      val t0 = System.nanoTime()
      val labels = Cluster.connectedComponents(s, edges)
      val n = labels.select("cluster_id").distinct().count()
      val t = (System.nanoTime() - t0) / 1e9
      labels.unpersist(false)
      println(f"[cc] run $i clusters=$n wall=$t%.3f s")
    }
    s.stop()
  }
}
