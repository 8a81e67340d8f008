package graft.tools

import org.apache.spark.sql.SparkSession
import graft.linkage._

/** Scratch: dump explain("formatted") of Scoring.scorePairs in the
  * scaling-kernel regime (broadcast disabled) to args(0). */
object ScoringPlanDump {
  def main(args: Array[String]): Unit = {
    val out = args(0)
    val s = SparkSession.builder()
      .master("local[16]")
      .appName("scoring-plan-dump")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.maxPlanStringLength", "100000000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    val cfg = SynthTranscripts.Config(seed = 42L, nConvs = 20000, days = 40)
    val records = Fold.fold(SynthTranscripts.transcripts(s, cfg).toDF)
      .persist()
    records.count()
    val pairs = Candidates.candidates(records, Blocking.defaultPasses)
      .persist()
    pairs.count()
    val df = Scoring.scorePairs(records, pairs)
    val txt = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val w = new java.io.PrintWriter(out, "UTF-8")
    try w.write(txt) finally w.close()
    println(s"[dump] wrote ${txt.length} chars to $out")
    s.stop()
  }
}
