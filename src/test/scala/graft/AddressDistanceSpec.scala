package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.linkage.Scoring

/** Pins the composite address comparator to the reference's own published
  * calibration exemplars (matching.py:25–31) — the strongest available
  * parity evidence, since those four numbers exercise the weight shift,
  * the suffix max-of-variants, the secondary-unit scoring and the
  * whole-string floor at once. */
class AddressDistanceSpec extends AnyFunSuite with SparkFixture {

  private def addr(number: String, street: String, suffix: String,
                   prefix: String, value: String, full: String) =
    (number, street, suffix, prefix, value, full)

  private def score(a: (String, String, String, String, String, String),
                    b: (String, String, String, String, String, String))
      : Double = {
    import spark.implicits._
    val df = Seq((a, b)).toDF("a", "b")
      .select(
        struct($"a._1".as("number"), $"a._2".as("street"),
          $"a._3".as("suffix"), $"a._4".as("prefix"),
          $"a._5".as("value"), $"a._6".as("full")).as("a"),
        struct($"b._1".as("number"), $"b._2".as("street"),
          $"b._3".as("suffix"), $"b._4".as("prefix"),
          $"b._5".as("value"), $"b._6".as("full")).as("b"))
    df.select(Scoring.addressDistance(col("a"), col("b")).as("s"))
      .head().getDouble(0)
  }

  private val garden205 =
    addr("205", "GARDEN", "ST", "", "", "205 GARDEN ST")
  private val garden206 =
    addr("206", "GARDEN", "ST", "", "", "206 GARDEN ST")
  private val garedn205 =
    addr("205", "GAREDN", "ST", "", "", "205 GAREDN ST")
  private val gardenStreet205 =
    addr("205", "GARDEN", "STREET", "", "", "205 GARDEN STREET")
  private val apt5F =
    addr("205", "GARDEN", "ST", "APT", "5F", "205 GARDEN ST APT 5F")
  private val apt5J =
    addr("205", "GARDEN", "ST", "APT", "5J", "205 GARDEN ST APT 5J")

  test("matching.py:26 — 205 vs 206 GARDEN ST → 0.8333") {
    assert(math.abs(score(garden205, garden206) - 0.8333) < 5e-4)
  }
  test("matching.py:27 — GARDEN vs GAREDN → 0.98444") {
    assert(math.abs(score(garden205, garedn205) - 0.98444) < 5e-5)
  }
  test("matching.py:28 — GARDEN STREET vs GAREDN ST → 0.9666") {
    assert(math.abs(score(gardenStreet205, garedn205) - 0.9666) < 1e-3)
  }
  test("matching.py:29 — APT 5F vs APT 5J → 0.9472") {
    assert(math.abs(score(apt5F, apt5J) - 0.9472) < 5e-4)
  }
  test("matching.py:71–83 — empty→0 (even both), identical→1") {
    val empty = addr("", "", "", "", "", "")
    assert(score(empty, empty) == 0.0)
    assert(score(empty, garden205) == 0.0)
    assert(score(garden205, garden205) == 1.0)
  }
  test("symmetry") {
    assert(math.abs(score(garden205, garedn205) -
      score(garedn205, garden205)) < 1e-12)
    assert(math.abs(score(apt5F, apt5J) - score(apt5J, apt5F)) < 1e-12)
  }

  // r06: scorePairs hoists the street jaro_winkler into its own opaque
  // column (the tree references it 3x and CaseWhen branches are
  // CSE-excluded) — the hoisted path must be BIT-identical to the
  // self-contained default tree on every pair of a real corpus.
  test("hoisted street-jw scorePairs ≡ default addressDistance") {
    import org.apache.spark.sql.functions._
    import graft.linkage.{Candidates, Blocking, Fold, SynthTranscripts}
    val records = Fold.fold(SynthTranscripts
      .transcripts(spark, SynthTranscripts.Config(nConvs = 400)).toDF)
    val pairs = Candidates.candidates(records, Blocking.defaultPasses)
    val viaScorePairs = Scoring.scorePairs(records, pairs)
      .select(col("id_a"), col("id_b"), col("addr_score"), col("total_score"))
    val attrs = records.select(col("conv_id"), col("family_name"),
      col("phone_number"), col("addr"))
    val a = attrs.toDF(attrs.columns.map("a_" + _): _*)
    val b = attrs.toDF(attrs.columns.map("b_" + _): _*)
    val manual = pairs
      .join(a, col("id_a") === col("a_conv_id"))
      .join(b, col("id_b") === col("b_conv_id"))
      .withColumn("addr_score",
        Scoring.addressDistance(col("a_addr"), col("b_addr"))) // default
      .filter(col("addr_score") > Scoring.AddrThreshold)
      .withColumn("total_score",
        graft.linkage.expr.functions.jaro_winkler(
          col("a_family_name"), col("b_family_name")) * Scoring.FnWeight +
        graft.linkage.expr.functions.jaro_winkler(
          col("a_phone_number"), col("b_phone_number")) * Scoring.PhoneWeight +
        col("addr_score") * Scoring.AddrWeight)
      .select(col("id_a"), col("id_b"), col("addr_score"), col("total_score"))
    assert(viaScorePairs.count() > 0)
    assert(viaScorePairs.exceptAll(manual).isEmpty &&
      manual.exceptAll(viaScorePairs).isEmpty)
  }

  // r06: Scoring wraps addr_score in gf.opaque (an optimizer barrier
  // marked non-deterministic, evaluation delegated to the child) — the
  // wrapped value must stay bit-identical through both the codegen
  // projection path and interpreted eval.
  test("opaque barrier is a bit-identical passthrough") {
    import spark.implicits._
    import graft.linkage.expr.{functions => gf}
    val df = Seq(("HELLO", "HELLP", 1.5), ("", "", -0.25),
      ("A", "ZZZZ", 0.0)).toDF("s1", "s2", "d")
    val rows = df.select(
      gf.jaro_winkler($"s1", $"s2").as("plain"),
      gf.opaque(gf.jaro_winkler($"s1", $"s2")).as("wrapped"),
      ($"d" * 3.0).as("dplain"),
      gf.opaque($"d" * 3.0).as("dwrapped")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(3)))
    }
    // interpreted path (no codegen): evaluate via an RDD-barrier frame
    val noCg = spark.range(1).selectExpr("'AB' as s1", "'AC' as s2")
    val ev = noCg.select(gf.opaque(gf.jaro_winkler($"s1", $"s2")).as("v"))
      .head().getDouble(0)
    assert(ev == graft.linkage.expr.Sim.jaroWinkler("AB", "AC"))
  }
}
