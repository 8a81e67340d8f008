package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Sources
import graft.sources.Sources._
import graft.linkage.Extract

/** Source-adapter seam (S3/S4, data_reader.py:188–293): the v1/v2 query
  * shapes over temp-view-backed sources, the latest-preferred-address
  * selection, and the v2 dictionary mapping through extract. The JDBC leg
  * is compile-covered only (no DB in the sandbox). */
class SourcesSpec extends AnyFunSuite with SparkFixture {

  private def mkViews(): Unit = {
    import spark.implicits._
    Seq(
      ("p1", "ANA", "DIAZ", "1980-01-01", "F", "5551111"),
      ("p2", "BEN", "KING", "1975-05-05", "M", "5552222"),
      ("p3", "CAL", "WEST", "1990-09-09", "M", "5553333"))
      .toDF("patid", "pat_firstname", "pat_lastname", "birth_date",
        "sex", "primary_phone")
      .createOrReplaceTempView("private_demographic")
    // p1: two preferred addresses, a2 more recent → a2 wins in `full`
    // p2: one preferred + one non-preferred → a3 in both modes
    // p3: NO preferred address → dropped by preferred/full (inner join)
    Seq(
      ("a1", "p1", "1 OLD RD", "", "02139", "Y", "2018-01-01"),
      ("a2", "p1", "2 NEW ST", "APT 3", "02139", "Y", "2021-06-15"),
      ("a3", "p2", "7 ELM AVE", "", "02140", "Y", "2019-03-03"),
      ("a4", "p2", "8 OAK DR", "", "02141", "N", "2022-01-01"),
      ("a5", "p3", "9 PINE LN", "", "02142", "N", "2020-02-02"))
      .toDF("addressid", "patid", "address_street", "address_detail",
        "address_zip5", "address_preferred", "address_period_start")
      .createOrReplaceTempView("private_address_history")
  }

  test("v2 full: most recent preferred address per patid (q_window_top1 shape)") {
    mkViews()
    val out = Sources.loadV2(spark, TableSource("private_demographic"),
      TableSource("private_address_history"), FullHistory)
    val rows = out.select("patid", "addressid").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows == Map("p1" -> "a2", "p2" -> "a3")) // p3 dropped
  }

  test("v2 preferred / single modes") {
    mkViews()
    val pref = Sources.loadV2(spark, TableSource("private_demographic"),
      TableSource("private_address_history"), PreferredAddress)
    // p1 has TWO preferred rows → both survive in preferred mode (the
    // reference documents this mode as only safe when data guarantees one)
    assert(pref.filter(col("patid") === "p1").count() == 2)
    assert(pref.filter(col("patid") === "p3").count() == 0)
    val single = Sources.loadV2(spark, TableSource("private_demographic"),
      TableSource("private_address_history"), SingleAddress)
    assert(single.count() == 5) // plain join keeps every address row
  }

  test("v1 load + v2 dictionary flows into extract") {
    mkViews()
    // v1: plain scan of the named table
    val v1 = Sources.loadV1(spark, TableSource("private_demographic"))
    assert(v1.count() == 3)
    // v2 full → extract with the v2 dictionary: multi-column address
    // concat + clean_string; p1's address picks up the APT 3 detail
    val joined = Sources.loadV2(spark, TableSource("private_demographic"),
      TableSource("private_address_history"), FullHistory)
    val extracted = Extract.extract(joined, Sources.DataDictionary.v2)
    val byId = extracted.collect().map(r => r.getString(0) -> r).toMap
    assert(byId("p1").getString(6) == "2 NEW ST APT 3")
    assert(byId("p1").getString(7) == "02139")
    assert(byId("p2").getString(2) == "KING")
    // JDBC leg: constructing the source is cheap; loading fails only at
    // connection time (no DB here) — the seam itself is exercised
    val jdbc = JdbcSource("jdbc:postgresql://db/codi", "codi.identifier",
      Map("user" -> "u"))
    assert(jdbc.table == "codi.identifier")
  }
}
