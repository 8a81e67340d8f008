package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.linkage.{AddressTagger, Scoring}

/** Rule-based address tagging (P9, addr_parse analog): field assignment
  * over the usaddress label subset, and END-TO-END reproduction of the
  * reference's calibration exemplars (matching.py:25–31) from the raw
  * strings — tagger → comparator, no hand-built structs. */
class AddressTaggerSpec extends AnyFunSuite with SparkFixture {

  private def tagOne(s: String): Map[String, String] = {
    import spark.implicits._
    val row = Seq(s).toDF("a")
      .select(AddressTagger.tag(col("a")).as("t"))
      .select("t.number", "t.street", "t.suffix", "t.prefix", "t.value")
      .head()
    Seq("number", "street", "suffix", "prefix", "value")
      .zipWithIndex.map { case (k, i) => k -> row.getString(i) }.toMap
  }

  test("field assignment across the grammar") {
    assert(tagOne("205 GARDEN ST") == Map("number" -> "205",
      "street" -> "GARDEN", "suffix" -> "ST", "prefix" -> "", "value" -> ""))
    assert(tagOne("205 GARDEN ST APT 5F") == Map("number" -> "205",
      "street" -> "GARDEN", "suffix" -> "ST", "prefix" -> "APT",
      "value" -> "5F"))
    // pre-directional dropped (usaddress tags it, addr_parse ignores it)
    assert(tagOne("12 N MAIN STREET") == Map("number" -> "12",
      "street" -> "MAIN", "suffix" -> "STREET", "prefix" -> "",
      "value" -> ""))
    // multi-word street, #-form occupancy: LAST street token wins —
    // usaddress emits one (token, StreetName) pair per token and the
    // reference's dict loop overwrites per pair (matching.py:48–53), so
    // the reference itself scores this street as "KING"
    assert(tagOne("1600 MARTIN LUTHER KING BLVD #12B") ==
      Map("number" -> "1600", "street" -> "KING",
        "suffix" -> "BLVD", "prefix" -> "#", "value" -> "12B"))
    // suffix-only body → street missing, suffix kept (matching.py:137–162
    // branch gets exercised downstream)
    assert(tagOne("205 ST") == Map("number" -> "205", "street" -> "",
      "suffix" -> "ST", "prefix" -> "", "value" -> ""))
    // number with letter, unit designator spelled out
    assert(tagOne("42A ELM AVE UNIT 7") == Map("number" -> "42A",
      "street" -> "ELM", "suffix" -> "AVE", "prefix" -> "UNIT",
      "value" -> "7"))
    // blank → all-empty struct (addr_parse exception path)
    assert(tagOne("") == Map("number" -> "", "street" -> "",
      "suffix" -> "", "prefix" -> "", "value" -> ""))
  }

  test("grid and USPS-box classes tag like the CRF (promoted positives)") {
    // Wisconsin grid style: usaddress tags the whole grid token
    // AddressNumber — the number rule now accepts it
    assert(tagOne("N100W200 COUNTY ROAD") == Map("number" -> "N100W200",
      "street" -> "COUNTY", "suffix" -> "ROAD", "prefix" -> "",
      "value" -> ""))
    assert(tagOne("W204N11912 LANNON DR") == Map("number" -> "W204N11912",
      "street" -> "LANNON", "suffix" -> "DR", "prefix" -> "",
      "value" -> ""))
    // USPS box routes: usaddress labels every token USPSBox*, all of
    // which addr_parse DROPS (matching.py:34–59) → all-empty struct
    val empty = Map("number" -> "", "street" -> "", "suffix" -> "",
      "prefix" -> "", "value" -> "")
    assert(tagOne("HC 68 BOX 23A") == empty)
    assert(tagOne("RURAL ROUTE 4") == empty)
    assert(tagOne("RR 2 BOX 152") == empty)
    assert(tagOne("PO BOX 1234") == empty)
    // identical strings still score 1.0 (exact-match short-circuit)
    assert(scoreRaw("HC 68 BOX 23A", "HC 68 BOX 23A") == 1.0)
    assert(scoreRaw("N100W200 COUNTY ROAD", "N100W200 COUNTY ROAD") == 1.0)
  }

  test("no-number occupancy designators tag like the CRF (USPS C2 set)") {
    // usaddress tags a bare trailing REAR/BSMT/UPPR/… OccupancyType with
    // no OccupancyIdentifier → prefix set, value empty (promoted from
    // the former coverage-boundary negative)
    assert(tagOne("12 ELM ST REAR") ==
      Map("number" -> "12", "street" -> "ELM", "suffix" -> "ST",
        "prefix" -> "REAR", "value" -> ""))
    assert(tagOne("40 OAK AVE BSMT") ==
      Map("number" -> "40", "street" -> "OAK", "suffix" -> "AVE",
        "prefix" -> "BSMT", "value" -> ""))
    assert(tagOne("7 HILL RD UPPER") ==
      Map("number" -> "7", "street" -> "HILL", "suffix" -> "RD",
        "prefix" -> "UPPER", "value" -> ""))
    // the WITH-id form of the same designator still pairs (PH 2)
    assert(tagOne("9 LAKE DR PH 2") ==
      Map("number" -> "9", "street" -> "LAKE", "suffix" -> "DR",
        "prefix" -> "PH", "value" -> "2"))
    assert(scoreRaw("12 ELM ST REAR", "12 ELM ST REAR") == 1.0)
  }

  test("coverage boundary: addresses the rule grammar mis-tags vs the CRF") {
    // The lexicon'd grammar covers the common ~95% and the calibration
    // exemplars; this documents where it still DIVERGES from usaddress
    // (matching.py:34–59) and why that is accepted: both sides of a pair
    // are tagged by the SAME grammar, the whole-string JW floor
    // (matching.py:245–248) still scores the raw strings, and the shape
    // below is genuinely malformed input.
    //
    // A TRUNCATED "<TYPE>" with its id missing, for a designator that
    // REQUIRES a secondary number (USPS C2): "APT" bare is not in the
    // no-id set, the pair rule needs an id, so it leaks into the street
    // slot. usaddress would still call it OccupancyType.
    assert(tagOne("205 GARDEN ST APT") ==
      Map("number" -> "205", "street" -> "APT", "suffix" -> "",
        "prefix" -> "", "value" -> ""))
    // symmetric treatment keeps identical strings at 1.0 regardless
    assert(scoreRaw("205 GARDEN ST APT", "205 GARDEN ST APT") == 1.0)
  }

  private def scoreRaw(a: String, b: String): Double = {
    import spark.implicits._
    Seq((a, b)).toDF("a", "b")
      .select(Scoring.addressDistance(
        AddressTagger.tag(col("a")), AddressTagger.tag(col("b"))).as("s"))
      .head().getDouble(0)
  }

  test("matching.py:25–31 exemplars reproduce from RAW strings") {
    assert(math.abs(scoreRaw("205 GARDEN ST", "206 GARDEN ST") - 0.8333)
      < 5e-4)
    assert(math.abs(scoreRaw("205 GARDEN ST", "205 GAREDN ST") - 0.98444)
      < 5e-5)
    assert(math.abs(scoreRaw("205 GARDEN STREET", "205 GAREDN ST") - 0.9666)
      < 1e-3)
    assert(math.abs(scoreRaw("205 GARDEN ST APT 5F", "205 GARDEN ST APT 5J")
      - 0.9472) < 5e-4)
  }

  test("extracted records flow into blocking/scoring shape") {
    import spark.implicits._
    val extracted = Seq(
      ("r1", "AL", "SMITH", "", "M", "5551234", "205 GARDEN ST", "02139"),
      ("r2", "AL", "SMITH", "", "M", "5551234", "205 GAREDN ST", "02139"))
      .toDF("record_id", "given_name", "family_name", "DOB", "sex",
        "phone_number", "household_street_address", "household_zip")
    val recs = AddressTagger.parseAddressRecords(extracted)
    val pairs = Seq(("r1", "r2")).toDF("id_a", "id_b")
    val scored = Scoring.scorePairs(recs, pairs).head()
    assert(scored.getDouble(scored.fieldIndex("addr_score")) > 0.95)
    assert(scored.getDouble(scored.fieldIndex("total_score")) > 0.85)
  }
}
