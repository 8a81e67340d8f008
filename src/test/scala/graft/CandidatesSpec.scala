package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.linkage.{Blocking, Candidates}

/** Candidate-generation invariants: the salted triangle self-join emits
  * exactly the same pair set as the plain blocked self-join, and the
  * oversized-block ratio cap drops hot blocks (p-sig 2% rule analog). */
class CandidatesSpec extends AnyFunSuite with SparkFixture {

  /** Records with controllable block sizes: `n` rows in block "HOT",
    * plus small blocks of 3. Address always present. */
  private def recs(nHot: Int, nSmallBlocks: Int) = {
    import spark.implicits._
    val hot = (0 until nHot).map(i => (f"h$i%04d", "HOT"))
    val small = (0 until nSmallBlocks).flatMap(b =>
      (0 until 3).map(i => (f"s$b%03d-$i", s"B$b")))
    (hot ++ small).toDF("conv_id", "key")
      .withColumn("household_zip", lit("2025-01-01"))
      .withColumn("family_name", col("key"))
      .withColumn("addr", struct(
        lit("1").as("number"), col("key").as("street"),
        lit("X").as("suffix"), lit("").as("prefix"),
        lit("").as("value"), concat(lit("1 "), col("key")).as("full")))
  }

  private val pass = Seq(Blocking.Pass("k", Seq("household_zip",
    "family_name")))

  test("salted triangle join ≡ plain blocked self-join (same pair set)") {
    val df = recs(nHot = 60, nSmallBlocks = 5)
    // plain: salting never kicks in
    val plain = Candidates.candidates(df, pass,
      Candidates.Config(ratioMax = 1.0, saltThreshold = 100000))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // salted: the 60-row block goes through the triangle path
    val salted = Candidates.candidates(df, pass,
      Candidates.Config(ratioMax = 1.0, saltThreshold = 10, salts = 4))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(plain == salted, s"diff: ${(plain diff salted).take(5)} / " +
      s"${(salted diff plain).take(5)}")
    // sanity: expected count = C(60,2) + 5*C(3,2)
    assert(plain.size == 60 * 59 / 2 + 5 * 3)
    // a<b and no self-pairs
    assert(plain.forall { case (a, b) => a < b })
  }

  test("block keys never collide across field boundaries") {
    import spark.implicits._
    // (street=AB, number=C) vs (street=A, number=BC): with an empty
    // KeySep these concatenate identically and merge into one block —
    // the separator must keep them apart (distinct tuples ⇒ no pairs)
    val df = Seq(("r1", "AB", "C"), ("r2", "A", "BC"))
      .toDF("conv_id", "street", "number")
      .withColumn("household_zip", lit("Z"))
      .withColumn("family_name", lit(""))
      .withColumn("addr", struct(
        col("number").as("number"), col("street").as("street"),
        lit("").as("suffix"), lit("").as("prefix"),
        lit("").as("value"),
        concat_ws(" ", col("number"), col("street")).as("full")))
    val collisionPass = Seq(Blocking.Pass("zsn",
      Seq("household_zip", "addr.street", "addr.number")))
    val pairs = Candidates.candidates(df, collisionPass,
      Candidates.Config(ratioMax = 1.0, minBlockCap = 100))
    assert(pairs.count() == 0,
      "distinct (street, number) tuples must land in different blocks")
    // and identical tuples still pair up
    val same = Seq(("r1", "A", "B"), ("r2", "A", "B"))
      .toDF("conv_id", "street", "number")
      .withColumn("household_zip", lit("Z"))
      .withColumn("family_name", lit(""))
      .withColumn("addr", struct(
        col("number").as("number"), col("street").as("street"),
        lit("").as("suffix"), lit("").as("prefix"),
        lit("").as("value"),
        concat_ws(" ", col("number"), col("street")).as("full")))
    assert(Candidates.candidates(same, collisionPass,
      Candidates.Config(ratioMax = 1.0, minBlockCap = 100)).count() == 1)
  }

  test("ratio cap drops oversized blocks entirely (2% rule analog)") {
    val df = recs(nHot = 60, nSmallBlocks = 5)
    // total = 75; cap at 40% → 30 rows: HOT (60) dropped, B* (3) kept
    val capped = Candidates.candidates(df, pass,
      Candidates.Config(ratioMax = 0.4, minBlockCap = 2,
        saltThreshold = 100000))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(capped.size == 5 * 3)
    assert(capped.forall { case (a, b) => a.startsWith("s") })
  }
}
