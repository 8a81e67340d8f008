package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.linkage._
import graft.linkage.expr.{functions => gf}

/** Scratch: attribute per-pair scoring CPU — baseline row cost vs one
  * jaro_winkler vs the full composite addressDistance tree. Also a pure
  * JVM jw loop for ns/call. */
object ScoreCostProbe {
  private def exec(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    // pure-JVM kernel cost first
    val s1 = org.apache.spark.unsafe.types.UTF8String.fromString("205 GARDEN ST APT 5F")
    val s2 = org.apache.spark.unsafe.types.UTF8String.fromString("205 GAREDN STREET APT 5J")
    var acc = 0.0
    (1 to 200000).foreach(_ => acc += graft.linkage.expr.Sim.jaroWinklerUtf8(s1, s2))
    val t0 = System.nanoTime()
    (1 to 2000000).foreach(_ => acc += graft.linkage.expr.Sim.jaroWinklerUtf8(s1, s2))
    println(f"[cost] pure jw (20x24 chars): ${(System.nanoTime()-t0)/2e6}%.0f ns/call (acc=$acc)")

    val s = SparkSession.builder().master("local[16]")
      .appName("score-cost-probe")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.maxPlanStringLength", "100000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    val cfg = SynthTranscripts.Config(seed = 42L, nConvs = 200000, days = 400)
    val records = Fold.fold(SynthTranscripts.transcripts(s, cfg).toDF).persist()
    records.count()
    val pairs = Candidates.candidates(records, Blocking.defaultPasses).persist()
    val np = pairs.count()
    val attrs = records.select(col("conv_id"), col("family_name"),
      col("phone_number"), col("addr"))
    val a = attrs.toDF(attrs.columns.map("a_" + _): _*)
    val b = attrs.toDF(attrs.columns.map("b_" + _): _*)
    // materialize the joined relation once so every variant times ONLY
    // its projection
    val joined = pairs
      .join(a, col("id_a") === col("a_conv_id"))
      .join(b, col("id_b") === col("b_conv_id"))
      .persist()
    joined.count()
    // string-length profile of the fields the comparator reads
    joined.select(
      avg(length(col("a_addr").getField("full"))).as("avg_full"),
      max(length(col("a_addr").getField("full"))).as("max_full"),
      avg(length(col("a_addr").getField("street"))).as("avg_street"),
      avg(length(col("a_family_name"))).as("avg_fn")).show()
    val variants: Seq[(String, DataFrame)] = Seq(
      ("baseline id only", joined.select(col("id_a"))),
      ("read structs, cheap work", joined.select(col("id_a"),
        (length(col("a_addr").getField("full")) +
         length(col("b_addr").getField("full")) +
         length(col("a_addr").getField("street")) +
         length(col("b_addr").getField("street"))).as("j"))),
      ("1 jw on full strings", joined.select(col("id_a"),
        gf.jaro_winkler(col("a_addr").getField("full"),
          col("b_addr").getField("full")).as("j"))),
      ("4 jw distinct args", joined.select(col("id_a"),
        (gf.jaro_winkler(col("a_addr").getField("full"), col("b_addr").getField("full")) +
         gf.jaro_winkler(col("a_addr").getField("street"), col("b_addr").getField("street")) +
         gf.jaro_winkler(col("a_family_name"), col("b_family_name")) +
         gf.jaro_winkler(col("a_phone_number"), col("b_phone_number"))).as("j"))),
      ("full addressDistance", joined.select(col("id_a"),
        Scoring.addressDistance(col("a_addr"), col("b_addr")).as("j"))),
      ("addr opaque+filter+total UNhoisted", {
        val withAddr = joined.select(col("id_a"),
            col("a_family_name"), col("b_family_name"),
            col("a_phone_number"), col("b_phone_number"),
            gf.opaque(Scoring.addressDistance(col("a_addr"),
              col("b_addr"))).as("addr_score"))
          .filter(col("addr_score") > 0.95)
        withAddr.select(col("id_a"),
          (gf.jaro_winkler(col("a_family_name"), col("b_family_name")) * 0.25 +
           gf.jaro_winkler(col("a_phone_number"), col("b_phone_number")) * 0.2 +
           col("addr_score") * 0.55).as("t"))
      }),
      ("addr HOISTED street jw (shipped)", {
        val withAddr = joined.select(col("id_a"),
            col("a_family_name"), col("b_family_name"),
            col("a_phone_number"), col("b_phone_number"), col("a_addr"),
            col("b_addr"),
            gf.opaque(gf.jaro_winkler(col("a_addr").getField("street"),
              col("b_addr").getField("street"))).as("_street_jw"))
          .select(col("id_a"),
            col("a_family_name"), col("b_family_name"),
            col("a_phone_number"), col("b_phone_number"),
            gf.opaque(Scoring.addressDistance(col("a_addr"), col("b_addr"),
              streetJw = Some(col("_street_jw")))).as("addr_score"))
          .filter(col("addr_score") > 0.95)
        withAddr.select(col("id_a"),
          (gf.jaro_winkler(col("a_family_name"), col("b_family_name")) * 0.25 +
           gf.jaro_winkler(col("a_phone_number"), col("b_phone_number")) * 0.2 +
           col("addr_score") * 0.55).as("t"))
      }))
    variants.foreach { case (tag, df) =>
      (1 to 2).foreach(_ => exec(df))
      val times = (1 to 3).map { _ =>
        val t = System.nanoTime(); exec(df); (System.nanoTime() - t) / 1e9
      }
      println(f"[cost] $tag%-36s best=${times.min}%6.3f s  " +
        f"(${times.min * 16e9 / np}%.0f ns-cpu/pair upper bound)")
    }
    println(s"[cost] pairs=$np")
    s.stop()
  }
}
