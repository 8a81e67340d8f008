package graft.linkage

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iceberg-like table layout over Parquet (SURVEY.md §7.6: no Iceberg
  * runtime jar exists in this sandbox — verified /opt/spark/jars).
  * Every table write produces:
  *   <path>/data/…parquet        (optionally partitioned)
  *   <path>/_snapshot.json       (row count, schema, file list — the
  *                                manifest/snapshot pointer)
  * giving the north rule's per-partition lineage/metrics + resumability
  * hooks; a real Iceberg catalog can be swapped in behind this interface
  * on a real cluster.
  */
object TableIO {

  def write(df: DataFrame, path: String,
            partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    val withPart = if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*)
                   else w
    withPart.parquet(s"$path/data")
    writeSnapshot(df, path)
  }

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/data")

  /** Bucketed write: pre-hash-partitions a table on its join key so every
    * downstream equi-join on that key skips the shuffle of this side
    * entirely (Exchange elided by EnsureRequirements). At 100 TB this is
    * the difference between moving the fat records table per join and
    * never moving it — bucket `records` by conv_id once at fold time,
    * then pair-attribute joins (J7) stream bucket-local.
    * Uses the session catalog (saveAsTable is how Spark persists bucket
    * metadata); `database`.`name` table identifier. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int): Unit = {
    val spark = df.sparkSession
    // A table the CATALOG knows about is overwritten through saveAsTable
    // itself — never by a hand-computed path delete (the old code derived
    // <warehouse>/<table.toLowerCase>, which is the wrong path for a
    // qualified db.table identifier or a custom-LOCATION table, and on a
    // shared warehouse deleted data this session does not own).
    //
    // What saveAsTable cannot handle alone is the ORPHAN case: a
    // warehouse directory left by a previous JVM whose in-memory catalog
    // died with it — overwrite then fails with LOCATION_ALREADY_EXISTS.
    // Clear it only when (a) the catalog has NO entry (so no live table
    // is harmed), (b) the name is unqualified (the default-database
    // layout <warehouse>/<name> is the only one we can derive), keeping
    // the delete inside this session's warehouse by construction.
    if (!spark.catalog.tableExists(table) && !table.contains(".")) {
      val warehouse = spark.conf.get("spark.sql.warehouse.dir")
      val loc = new org.apache.hadoop.fs.Path(warehouse, table.toLowerCase)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
  }

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** S10 analog (garble.py:82–93): resolve the newest timestamped table
    * under `dir` by lexicographic name (names carry sortable stamps,
    * e.g. pii-YYYYMMDD-HHMMSS). */
  def latestTimestampedPath(spark: SparkSession, dir: String,
                            prefix: String): Option[String] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(dir)
    if (!fs.exists(p)) return None
    val names = fs.listStatus(p).toSeq
      .map(_.getPath.getName)
      .filter(_.startsWith(prefix))
    if (names.isEmpty) None else Some(s"$dir/${names.max}")
  }

  private def writeSnapshot(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val dataPath = new org.apache.hadoop.fs.Path(s"$path/data")
    val files = listParquet(fs, dataPath)
    // the session-shared FileStatusCache may hold the PREVIOUS overwrite's
    // listing for this path — a second write of the same table in one
    // session would otherwise read back stale files (or FILE_NOT_EXIST)
    spark.catalog.refreshByPath(s"$path/data")
    val count = spark.read.parquet(s"$path/data").count()
    val filesJson = files.map(f =>
      s"""{"path": "${f._1}", "bytes": ${f._2}}""").mkString("[", ",", "]")
    val schemaJson = df.schema.json.replace("\\", "\\\\").replace("\"", "\\\"")
    val json =
      s"""{"row_count": $count, "num_files": ${files.size},
         |"schema": "$schemaJson",
         |"files": $filesJson}""".stripMargin
    val out = fs.create(
      new org.apache.hadoop.fs.Path(s"$path/_snapshot.json"), true)
    out.write(json.getBytes("UTF-8"))
    out.close()
  }

  private def listParquet(fs: org.apache.hadoop.fs.FileSystem,
                          dir: org.apache.hadoop.fs.Path)
      : Seq[(String, Long)] = {
    val it = fs.listFiles(dir, true)
    val buf = Seq.newBuilder[(String, Long)]
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet"))
        buf += ((f.getPath.toString, f.getLen))
    }
    buf.result()
  }
}
