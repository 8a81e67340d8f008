package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.Sources
import graft.sources.Sources._

/** The JDBC leg against a REAL database: Spark's bundled embedded Derby
  * (jars ship with the distribution, so this runs offline). Exercises the
  * reference's v1 plain scan and all three v2 address-selection modes over
  * spark.read.jdbc, proves JDBC ≡ table-leg results on identical data, and
  * pins the at-scale property: the preferred='Y' filter and the column
  * pruning are PUSHED TO THE DATABASE (visible in the JDBCRelation scan),
  * not applied after a full-table fetch. */
class JdbcSourcesSpec extends AnyFunSuite with SparkFixture {

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private val props = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")

  private lazy val dbReady: Unit = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute(
        """CREATE TABLE private_demographic (
          |  patid VARCHAR(16) NOT NULL,
          |  pat_firstname VARCHAR(64), pat_lastname VARCHAR(64),
          |  birth_date VARCHAR(16), sex VARCHAR(4),
          |  primary_phone VARCHAR(24))""".stripMargin)
      st.execute(
        """CREATE TABLE private_address_history (
          |  addressid VARCHAR(16) NOT NULL,
          |  patid VARCHAR(16) NOT NULL,
          |  address_street VARCHAR(128), address_detail VARCHAR(64),
          |  address_zip5 VARCHAR(8), address_preferred VARCHAR(2),
          |  address_period_start DATE)""".stripMargin)
      // p1: two preferred addresses (newest wins in full mode; ties broken
      // on addressid elsewhere), plus one non-preferred.
      // p2: single preferred address. p3: NO preferred address (drops out
      // of preferred/full — the reference's inner-join semantics).
      // p1's second preferred row has a NULL period start (NULLS LAST).
      st.execute("INSERT INTO private_demographic VALUES " +
        "('p1','ANA','GARCIA','1990-01-01','F','5551230001')," +
        "('p2','BOB','SMITH','1985-05-05','M','5551230002')," +
        "('p3','CAL','JONES','1970-09-09','M','5551230003')")
      st.execute("INSERT INTO private_address_history VALUES " +
        "('a1','p1','1 OLD RD','','02139','Y',DATE('2019-01-01'))," +
        "('a2','p1','2 NEW ST','APT 3','02140','Y',DATE('2021-06-15'))," +
        "('a3','p1','9 NEVER LN','','02141','N',DATE('2023-01-01'))," +
        "('a4','p1','8 NULLSTART AV','','02142','Y',NULL)," +
        "('a5','p2','5 MAIN ST','','02143','Y',DATE('2020-03-03'))," +
        "('a6','p3','7 SIDE ST','','02144','N',DATE('2022-02-02'))")
      st.close()
    } finally conn.close()
    // table-leg twins of the same data, for leg-equivalence checks
    JdbcSource(url, "private_demographic", props).load(spark)
      .createOrReplaceTempView("tv_demo")
    JdbcSource(url, "private_address_history", props).load(spark)
      .createOrReplaceTempView("tv_addr")
  }

  test("v1: plain JDBC scan loads the identifier table") {
    dbReady
    val v1 = Sources.loadV1(spark, JdbcSource(url, "private_demographic", props))
    assert(v1.count() == 3)
    assert(v1.columns.map(_.toLowerCase).toSet.contains("patid"))
    val ana = v1.filter(lower(col("patid")) === "p1").collect().head
    assert(ana.getString(v1.columns.indexWhere(_.equalsIgnoreCase("pat_firstname"))) == "ANA")
  }

  test("v2 full-history: correlated-top-1 decorrelation runs on a real dialect") {
    dbReady
    val demo = JdbcSource(url, "private_demographic", props)
    val addr = JdbcSource(url, "private_address_history", props)
    val full = Sources.loadV2(spark, demo, addr, FullHistory)
      .select(col("patid"), col("addressid"), col("address_street"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSet
    // p1 → newest preferred (a2); NULL start sorts last; p3 dropped
    assert(full == Set(("p1", "a2", "2 NEW ST"), ("p2", "a5", "5 MAIN ST")),
      s"got $full")
  }

  test("v2 all modes: JDBC leg ≡ table leg on identical data") {
    dbReady
    for (mode <- Seq(SingleAddress, PreferredAddress, FullHistory)) {
      val viaJdbc = Sources.loadV2(spark,
        JdbcSource(url, "private_demographic", props),
        JdbcSource(url, "private_address_history", props), mode)
      val viaTable = Sources.loadV2(spark,
        TableSource("tv_demo"), TableSource("tv_addr"), mode)
      val j = viaJdbc.collect().map(_.toString).sorted.toSeq
      val t = viaTable.collect().map(_.toString).sorted.toSeq
      assert(j == t, s"$mode diverged: $j vs $t")
      // single mode keeps all 6 address rows; preferred/full filter to Y
      val expected = mode match {
        case SingleAddress => 6L
        case PreferredAddress => 4L
        case FullHistory => 2L
      }
      assert(viaJdbc.count() == expected, s"$mode count")
    }
  }

  test("preferred='Y' filter and column pruning push down to the database") {
    dbReady
    // Derby reports uppercase identifiers; compare case-insensitively
    val plan = Sources.loadV2(spark,
        JdbcSource(url, "private_demographic", props),
        JdbcSource(url, "private_address_history", props), PreferredAddress)
      .select("patid", "address_zip5")
      .queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("pushedfilters") &&
      plan.contains("address_preferred"),
      s"preferred filter not pushed to JDBC:\n$plan")
    // the address-side JDBC scan must not fetch unused wide columns
    val scanLine = plan.linesIterator
      .filter(l => l.contains("jdbcrelation(private_address_history"))
      .mkString("\n")
    assert(scanLine.nonEmpty && !scanLine.contains("address_detail"),
      s"column pruning did not reach the JDBC scan:\n$scanLine")
  }

  test("derived-table dbtable form: (SELECT …) q") {
    dbReady
    val derived = JdbcSource(url,
      "(SELECT patid, pat_lastname FROM private_demographic " +
        "WHERE sex = 'M') q", props).load(spark)
    assert(derived.columns.length == 2)
    assert(derived.collect().map(_.getString(0)).sorted.toSeq == Seq("p2", "p3"))
  }
}
