package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.linkage.Extract

/** Config-driven source adapters — reference utils/data_reader.py:
  * one interface serving CSV files, catalog/temp-view tables, and JDBC
  * URLs, with the reference's v1/v2 query shapes (get_query,
  * data_reader.py:188–293) expressed Spark-side.
  *
  * The JDBC leg builds a real `spark.read.jdbc` scan and compiles against
  * the public API, but is UNVERIFIABLE in this sandbox (no database, no
  * driver jar) — the table/CSV legs carry the tests; on a cluster the
  * JDBC source pushes the column pruning + (for v2 preferred) the
  * preferred='Y' filter down to the database.
  */
object Sources {

  /** One loadable record source (S1/S3 seam). */
  sealed trait RecordSource { def load(spark: SparkSession): DataFrame }

  /** S2: CSV with every column string-typed and ""-for-null. */
  case class CsvSource(path: String) extends RecordSource {
    def load(spark: SparkSession): DataFrame =
      Extract.readCsvAllStrings(spark, path)
  }

  /** Catalog table or temp view (the in-session stand-in for a DB table;
    * also the Iceberg-style catalog path on a real cluster). */
  case class TableSource(table: String) extends RecordSource {
    def load(spark: SparkSession): DataFrame = spark.table(table)
  }

  /** S3: JDBC table scan (data_reader.py:296–302 `load_db`). `table` may
    * be a qualified name ("codi.identifier") or a derived-table
    * "(SELECT …) q" — both valid dbtable values. */
  case class JdbcSource(url: String, table: String,
                        properties: Map[String, String] = Map.empty)
      extends RecordSource {
    def load(spark: SparkSession): DataFrame = {
      val props = new java.util.Properties()
      properties.foreach { case (k, v) => props.setProperty(k, v) }
      spark.read.jdbc(url, table, props)
    }
  }

  /** v2 address-selection modes (data_reader.py:86–100). */
  sealed trait AddressSelection
  case object SingleAddress extends AddressSelection
  case object PreferredAddress extends AddressSelection
  case object FullHistory extends AddressSelection

  /** v1 (get_query, data_reader.py:189–205): plain scan of the
    * identifier table — `SELECT * FROM codi.identifier`. */
  def loadV1(spark: SparkSession, identifier: RecordSource): DataFrame =
    identifier.load(spark)

  /** v2 (get_query, data_reader.py:206–293): private_demographic ⋈
    * private_address_history on patid, with one address per patid:
    *
    *  - single:    plain equi-join (data guaranteed 1 address/patid)
    *  - preferred: join + address_preferred = 'Y'
    *  - full:      the reference's correlated LIMIT-1 subquery (most
    *    recent preferred address by period start, NULLS LAST), which a
    *    driver-side loop can't do at scale — decorrelated into a window
    *    top-1 per patid: the same J3→W1 rewrite as q_window_top1.
    *    Deviation (§7.5): ties on the start date break on addressid
    *    (deterministic) where the reference's LIMIT 1 is engine-ordered.
    *
    * Patids whose preferred address is missing drop out in
    * preferred/full modes — the reference's inner-join semantics. */
  def loadV2(spark: SparkSession, demographic: RecordSource,
             addressHistory: RecordSource,
             selection: AddressSelection = FullHistory): DataFrame = {
    val demo = demographic.load(spark)
    val addr = addressHistory.load(spark)
    val addrForJoin = selection match {
      case SingleAddress => addr
      case PreferredAddress => addr.filter(col("address_preferred") === "Y")
      case FullHistory =>
        val w = Window.partitionBy(col("patid"))
          .orderBy(col("address_period_start").desc_nulls_last,
            col("addressid"))
        addr.filter(col("address_preferred") === "Y")
          .withColumn("_rn", row_number().over(w))
          .filter(col("_rn") === 1)
          .drop("_rn")
    }
    // drop the duplicated join key from the address side (select([demo,
    // addr]) in the reference yields both; Spark would reject ambiguity)
    val addrRenamed = addrForJoin
      .withColumnRenamed("patid", "_addr_patid")
    demo.join(addrRenamed, demo("patid") === addrRenamed("_addr_patid"))
      .drop("_addr_patid")
  }

  /** DATA_DICTIONARY (data_reader.py:13–44) as extract configs: the v2
    * multi-column address (address_street + address_detail) concatenates
    * through FieldSpec's multi-source path (case_insensitive_lookup,
    * data_reader.py:140–152). */
  object DataDictionary {
    import Extract.{FieldSpec, TranslationConfig}
    private def cfg(m: (String, Seq[String])*) =
      TranslationConfig(m.map { case (k, srcs) => k -> FieldSpec(srcs) }.toMap)
    val v1: TranslationConfig = cfg(
      "record_id" -> Seq("patid"),
      "given_name" -> Seq("given_name"),
      "family_name" -> Seq("family_name"),
      "DOB" -> Seq("birth_date"),
      "sex" -> Seq("sex"),
      "phone_number" -> Seq("household_phone"),
      "household_street_address" -> Seq("household_street_address"),
      "household_zip" -> Seq("household_zip"))
    val v2: TranslationConfig = cfg(
      "record_id" -> Seq("patid"),
      "given_name" -> Seq("pat_firstname"),
      "family_name" -> Seq("pat_lastname"),
      "DOB" -> Seq("birth_date"),
      "sex" -> Seq("sex"),
      "phone_number" -> Seq("primary_phone"),
      "household_street_address" -> Seq("address_street", "address_detail"),
      "household_zip" -> Seq("address_zip5"))
    val csv: TranslationConfig = cfg(
      Extract.Header.map(f => f -> Seq(f)): _*)
  }
}
