package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.linkage.AnswerKeys

/** Multi-site answer-key assembly + household scoring (build_key.py /
  * answer_key_map.py / hh_score.py): hand-computed P/R/F on a fixture. */
class AnswerKeysSpec extends AnyFunSuite with SparkFixture {

  import AnswerKeys._

  private lazy val answerKey = {
    import spark.implicits._
    // 3 true households: H1={p1,p2}, H2={p3}, H3={p4,p5}
    Seq(
      ("p1", "p1", "H1", "f1.json"), ("p2", "p1", "H1", "f2.json"),
      ("p3", "p3", "H2", "f3.json"),
      ("p4", "p4", "H3", "f4.json"), ("p5", "p4", "H3", "f5.json"))
      .toDF("record_id", "seed_record_id", "household_id", "file_name")
  }

  test("siteKey splits the flattened key by site membership") {
    import spark.implicits._
    val siteA = Seq("p1", "p2", "p3").toDF("record_id")
    val siteB = Seq("p3", "p4", "p5").toDF("record_id")
    val ka = siteKey(answerKey, siteA)
    val kb = siteKey(answerKey, siteB)
    assert(ka.select("record_id").collect().map(_.getString(0)).toSet ==
      Set("p1", "p2", "p3"))
    assert(kb.count() == 3)
    val full = fullAnswerKey(Map("site_a" -> ka, "site_b" -> kb))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(full("H1") == Seq("site_a"))
    assert(full("H2") == Seq("site_a", "site_b"))
    assert(full("H3") == Seq("site_b"))
  }

  test("hidMapping + householdScore reproduce hh_score arithmetic") {
    import spark.implicits._
    val ka = siteKey(answerKey, Seq("p1", "p2", "p3").toDF("record_id"))
    // inferred households at site a: pos 0 = {p1,p2} (correct),
    // pos 1 = {p3} (correct) — representative pid per pos
    val posPid = Seq((0L, "p1"), (1L, "p3"))
      .toDF("household_position", "pid")
    val mapping = hidMapping(ka, posPid)
    val m = mapping.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m == Map(0L -> "H1", 1L -> "H2"))
    // per-member file; pos 0 keeps max(pid)=p2 (the reference's
    // last-row-wins dict over sorted members)
    val members = Seq((0L, "p1"), (0L, "p2"), (1L, "p3"))
      .toDF("household_position", "pid")
    val (p, r, f) = householdScore(ka, members, mapping)
    // predictions: (p2,H1) TP, (p3,H2) TP → precision 1.0;
    // answer key has 3 (pid,hid) pairs → recall 2/3
    assert(p == 1.0)
    assert(math.abs(r - 2.0 / 3) < 1e-12)
    assert(math.abs(f - 0.8) < 1e-12)
    // a wrong merge drops precision: pos 2 = {p1,p3} mapped to H1 but
    // keeps max(pid)=p3 whose true household is H2
    val badMembers = Seq((0L, "p1"), (0L, "p3")).toDF("household_position", "pid")
    val badMapping = Seq((0L, "H1")).toDF("HOUSEHOLD_POSITION", "HOUSEHOLD_ID")
    val (p2, r2, _) = householdScore(ka, badMembers, badMapping)
    assert(p2 == 0.0 && r2 == 0.0)
  }
}
