package graft.linkage

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Resolve stage — reference `linkid_to_patid.py`: metadata gate, LINK_ID
  * → record-id positional join, household link fan-out (SURVEY.md §3.3).
  */
object Resolve {

  /** J8: metadata key-wise diff (validate_metadata.py:49–70). Returns the
    * discrepancy report (empty = clean). */
  def metadataDiff(a: Map[String, String],
                   b: Map[String, String]): Seq[String] = {
    val keys = (a.keySet ++ b.keySet).toSeq.sorted
    keys.flatMap { k =>
      (a.get(k), b.get(k)) match {
        case (Some(x), Some(y)) if x == y => None
        case (Some(x), Some(y)) => Some(s"$k: '$x' != '$y'")
        case (Some(_), None) => Some(s"$k: missing from right")
        case (None, Some(_)) => Some(s"$k: missing from left")
        case _ => None
      }
    }
  }

  /** Metadata gate (linkid_to_patid.py:159,185): abort unless clean or
    * forced. */
  def gate(expected: Map[String, String], actual: Map[String, String],
           force: Boolean = false): Unit = {
    val diff = metadataDiff(expected, actual)
    require(force || diff.isEmpty,
      s"metadata verification failed:\n${diff.mkString("\n")}")
  }

  /** get_metadata (validate_metadata.py:34–46): locate the metadata
    * member inside a garbled/linkage zip by name. Zero members → None
    * (the reference warns and returns None); more than one → first in
    * archive order, like the reference. Flat string-valued JSON parsed
    * with the same reader the sink uses. */
  def metadataFromZip(spark: SparkSession,
                      zipPath: String): Option[Map[String, String]] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(zipPath), spark.sparkContext.hadoopConfiguration)
    val zin = new java.util.zip.ZipInputStream(
      fs.open(new org.apache.hadoop.fs.Path(zipPath)))
    try {
      var entry = zin.getNextEntry
      while (entry != null) {
        if (entry.getName.contains("metadata")) {
          val txt = scala.io.Source.fromInputStream(zin).mkString
          return Some(
            """"([^"]+)"\s*:\s*"([^"]*)"""".r.findAllMatchIn(txt)
              .map(m => m.group(1) -> m.group(2)).toMap)
        }
        entry = zin.getNextEntry
      }
      None
    } finally zin.close()
  }

  /** S9: read the single CSV inside a linkage-agent zip (driver unzips to
    * temp, then a normal csv scan). */
  def readZipMemberCsv(spark: SparkSession, zipPath: String): DataFrame = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(zipPath), spark.sparkContext.hadoopConfiguration)
    val zin = new java.util.zip.ZipInputStream(
      fs.open(new org.apache.hadoop.fs.Path(zipPath)))
    val tmp = java.nio.file.Files.createTempDirectory("graft-links")
    var entry = zin.getNextEntry
    var csvPath: Option[java.nio.file.Path] = None
    while (entry != null) {
      if (entry.getName.endsWith(".csv")) {
        val p = tmp.resolve(new java.io.File(entry.getName).getName)
        java.nio.file.Files.copy(zin, p,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        csvPath = Some(p)
      }
      entry = zin.getNextEntry
    }
    zin.close()
    require(csvPath.isDefined, s"no CSV member found in $zipPath")
    spark.read.option("header", "true").csv(csvPath.get.toString)
  }

  /** Full resolve: gate on metadata, then J4 + J5 (Output.resolveLinks /
    * resolveHouseholdLinks). */
  def translate(links: DataFrame, orderedIds: DataFrame,
                expectedMeta: Map[String, String],
                actualMeta: Map[String, String],
                force: Boolean = false): DataFrame = {
    gate(expectedMeta, actualMeta, force)
    Output.resolveLinks(links, orderedIds)
  }
}
