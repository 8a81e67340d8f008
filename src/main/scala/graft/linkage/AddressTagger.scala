package graft.linkage

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rule-based street-address tagger (P9) — closes the gap the round-1
  * transcript-positional split left for actual address-shaped text.
  *
  * The reference parses with the usaddress CRF tagger and keeps five
  * labels (addr_parse, matching.py:34–59): AddressNumber → number,
  * StreetName → street, StreetNamePostType → suffix, OccupancyType →
  * prefix, OccupancyIdentifier → value; everything else (notably
  * StreetNamePreDirectional) is DROPPED. A CRF doesn't ship in this
  * sandbox, so this is a grammar over normalized (clean_string'd) text:
  *
  *   [number] [pre-directional]? <street…> [suffix]? [occ-type occ-id |
  *   #id]?
  *
  * with suffix/occupancy/directional lexicons (USPS C1/C2 abbreviations).
  * Pure Column tree — codegen'd, shuffle-free; produces exactly the
  * (number, street, suffix, prefix, value, full) struct Scoring expects,
  * and reproduces the reference's four calibration exemplars end-to-end
  * (AddressTaggerSpec).
  */
object AddressTagger {

  /** USPS street-suffix abbreviations + spelled-out forms (subset
    * covering the common ~95%). */
  val SuffixLexicon: Seq[String] = Seq(
    "ST", "STREET", "AVE", "AVENUE", "RD", "ROAD", "DR", "DRIVE",
    "LN", "LANE", "BLVD", "BOULEVARD", "CT", "COURT", "PL", "PLACE",
    "WAY", "CIR", "CIRCLE", "TER", "TERRACE", "HWY", "HIGHWAY",
    "PKWY", "PARKWAY", "SQ", "SQUARE", "TRL", "TRAIL", "LOOP", "RUN",
    "PIKE", "PATH", "ALY", "ALLEY", "BND", "BEND", "XING", "CROSSING")

  /** USPS secondary-unit designators (OccupancyType). */
  val OccupancyLexicon: Seq[String] = Seq(
    "APT", "APARTMENT", "UNIT", "STE", "SUITE", "FL", "FLOOR", "RM",
    "ROOM", "BLDG", "BUILDING", "LOT", "TRLR", "TRAILER", "DEPT",
    "SPC", "SPACE", "BSMT", "PH", "HNGR", "SLIP", "#")

  /** USPS Pub 28 Appendix C2 designators that appear WITHOUT a
    * secondary number (BSMT/FRNT/LBBY/LOWR/OFC/PH/REAR/SIDE/UPPR, plus
    * spelled-out forms): usaddress tags the bare trailing token
    * OccupancyType with no OccupancyIdentifier → prefix set, value
    * empty. Promoted from the coverage-boundary negatives (the former
    * "12 ELM ST REAR" divergence). */
  val NoIdOccupancy: Seq[String] = Seq(
    "BSMT", "BASEMENT", "FRNT", "FRONT", "LBBY", "LOBBY", "LOWR",
    "LOWER", "OFC", "OFFICE", "PH", "PENTHOUSE", "REAR", "SIDE",
    "UPPR", "UPPER")

  /** Pre-directionals — usaddress tags them StreetNamePreDirectional,
    * which addr_parse ignores, so they vanish from every field. */
  val Directionals: Seq[String] = Seq(
    "N", "S", "E", "W", "NE", "NW", "SE", "SW",
    "NORTH", "SOUTH", "EAST", "WEST")

  /** Tag one normalized address string into the Scoring addr struct. */
  def tag(addr: Column): Column = {
    val toks = split(trim(addr), "\\s+") // "" → [""], never empty
    val n = size(toks)
    val first = element_at(toks, 1)
    // AddressNumber: plain "205"/"42A", or the Wisconsin grid style
    // "N100W200"/"W204N11912" (usaddress tags the whole grid token
    // AddressNumber; promoted from the coverage-boundary negatives)
    val hasNum = first.rlike("^[0-9]+[A-Z]?$") ||
      first.rlike("^[A-Z][0-9]+[A-Z][0-9]+$")
    val number = when(hasNum, first).otherwise(lit(""))

    // USPS box routes (HC/RR/PO BOX…): usaddress labels every token
    // USPSBoxType/USPSBoxID/USPSBoxGroup*, ALL of which addr_parse drops
    // (matching.py:34–59 keeps only the five listed labels) — the
    // reference's struct for these is all-empty; mirror it instead of
    // last-wins mis-reading the box id as a street
    val boxRoute = trim(addr).rlike(
      "^(HC|RR|RT|RURAL ROUTE|STAR ROUTE|P ?O BOX|POB) [0-9]+( BOX [0-9A-Z]+)?$" +
        "|^P ?O BOX [0-9A-Z]+$")

    // occupancy: trailing "<TYPE> <id>" pair, a trailing "#<id>", or a
    // bare trailing no-number designator (USPS C2: REAR/BSMT/UPPR/…)
    val last = element_at(toks, -1)
    val secondLast = when(n >= 2, element_at(toks, -2)).otherwise(lit(""))
    val occPair = n >= 2 && secondLast.isin(OccupancyLexicon: _*)
    val occHash = !occPair && last.rlike("^#.+")
    val occSolo = !occPair && !occHash && last.isin(NoIdOccupancy: _*)
    val prefix = when(occPair, secondLast)
      .when(occHash, lit("#"))
      .when(occSolo, last).otherwise(lit(""))
    val value = when(occPair, last)
      .when(occHash, regexp_replace(last, "^#", "")).otherwise(lit(""))

    // street body = tokens between the number and the occupancy block
    val startIdx = when(hasNum, 2).otherwise(lit(1))
    val dropEnd = when(occPair, 2).when(occHash || occSolo, 1)
      .otherwise(lit(0))
    val bodyLen = greatest(n - dropEnd - (startIdx - 1), lit(0))
    val body0 = slice(toks, startIdx, bodyLen)
    val body = when(size(body0) >= 2 &&
        element_at(body0, 1).isin(Directionals: _*),
        slice(body0, lit(2), size(body0) - 1))
      .otherwise(body0)

    val lastBody = when(size(body) >= 1, element_at(body, -1))
      .otherwise(lit(""))
    val hasSuffix = size(body) >= 1 && lastBody.isin(SuffixLexicon: _*)
    val suffix = when(hasSuffix, lastBody).otherwise(lit(""))
    // LAST street token wins, not the joined body: usaddress emits one
    // (token, StreetName) pair per token and the reference's dict loop
    // overwrites street per pair (matching.py:48–53), so "GARDEN VIEW ST"
    // scores with street="VIEW" in the reference. Mirrored for scoring
    // parity — the full string still participates via the whole-string
    // JW floor (matching.py:245–248), which bounds the information loss.
    val streetToks = when(hasSuffix,
      slice(body, lit(1), greatest(size(body) - 1, lit(0)))).otherwise(body)
    val street = when(size(streetToks) >= 1, element_at(streetToks, -1))
      .otherwise(lit(""))

    val tagged = struct(number.as("number"), street.as("street"),
      suffix.as("suffix"), prefix.as("prefix"), value.as("value"),
      trim(addr).as("full"))
    val e = lit("")
    when(boxRoute, struct(e.as("number"), e.as("street"), e.as("suffix"),
      e.as("prefix"), e.as("value"), trim(addr).as("full")))
      .otherwise(tagged)
  }

  /** Extract-shaped records (Extract.Header) → Scoring/Blocking-ready:
    * adds the tagged `addr` struct from household_street_address and
    * aliases record_id to conv_id, so the CSV/JDBC extract path runs the
    * same pipeline the transcript fold feeds. */
  def parseAddressRecords(extracted: DataFrame): DataFrame =
    extracted
      .withColumn("addr",
        tag(upper(col("household_street_address"))))
      .withColumn("conv_id", col("record_id"))
}
