package graft.linkage

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** spark-submit entry point for the full linkage pipeline (north-rule
  * deployment surface; the reference's `households.py` CLI analog):
  *
  *   spark-submit --class graft.linkage.LinkageMain <jar> \
  *     --input <transcripts parquet/TableIO dir> \
  *     --output <dir> \
  *     [--checkpoint <dir>]       CC round checkpoints (resumable)
  *     [--exact-addresses]        exact mode (matching.py:401–402)
  *     [--pairsfile <parquet>]    pre-computed matched pairs
  *     [--secret <hex>]           emit household CLKs (garble stage)
  *     [--testrun]                emit the scoring files
  *     [--buckets <n>]            persist records conv_id-bucketed (n
  *                                buckets) so pair-attribute joins never
  *                                shuffle the record structs
  *     [--max-turns <n>]          runaway-conversation guard: keep only
  *                                the n lowest-turn_idx turns per
  *                                conversation (bounds the fold buffer;
  *                                breaks per-turn equality for truncated
  *                                conversations by design)
  *     [--previous <dir>]         daily-append mode: link --input against
  *                                the records/matched_pairs of an earlier
  *                                run's output dir (Pipeline.incremental —
  *                                O(new × neighborhood), labels equal a
  *                                full recompute)
  *     [--householddef <csv>]     household definitions file: skip
  *                                inference, CLK-encode the given
  *                                households (households.py -d)
  *     [--synthetic <nConvs>]     generate a synthetic corpus instead of
  *                                reading --input
  *
  * Writes TableIO-layout tables under --output: records, matched_pairs,
  * clusters, mapping, metrics (+ household_clks, scoring files).
  * Cluster sizing (partitions, AQE) comes from spark-submit conf; set
  * spark.sql.adaptive.advisoryPartitionSizeInBytes low (8m) — scoring is
  * CPU-bound, not byte-bound (see BASELINE.md).
  */
object LinkageMain {

  private def parseArgs(args: Array[String]): Map[String, String] =
    Cli.parse(args, flags = Set("exact-addresses", "testrun"))

  /** --householddef (households.py:39–44, 322–323, 404–407): the user
    * supplies household definitions (HOUSEHOLD_PII_HEADERS csv:
    * family_name, phone_number, household_street_address, household_zip,
    * record_ids) — inference is skipped entirely; the definitions are
    * CLK-encoded with the households subkey and the metadata records
    * households_inferred = false. */
  def householdDefFlow(spark: SparkSession, defPath: String, out: String,
                       secret: Option[String]): Long = {
    val hhPii = Extract.readCsvAllStrings(spark, defPath)
      .withColumn("cluster_id", col("record_ids"))
    val n = hhPii.count()
    secret.foreach { s =>
      val clks = Garble.householdClks(hhPii, s)
      Garble.writeClksJson(
        clks.withColumnRenamed("cluster_id", "conv_id"),
        s"$out/household_clks")
    }
    Extract.writeMetadata(spark, Map(
      "number_of_households" -> n.toString,
      "households_inferred" -> "false"), s"$out/households_metadata.json")
    n
  }

  def main(args: Array[String]): Unit = {
    // parse BEFORE building the session: a bad argv must fail without
    // spinning up (and then leaking) a cluster session
    val opts = parseArgs(args)
    val builder = SparkSession.builder()
      .appName("graft-linkage")
      .config("spark.sql.session.timeZone", "UTC")
    // spark-submit injects spark.master; fall back to local[*] when run
    // directly (sbt runMain)
    val spark = (if (sys.props.contains("spark.master")) builder
                 else builder.master("local[*]")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, opts)
    finally spark.stop()
  }

  def run(spark: SparkSession, opts: Map[String, String]): Unit = {
    val out = opts.getOrElse("output",
      throw new IllegalArgumentException("--output required"))

    opts.get("householddef").foreach { defPath =>
      val n = householdDefFlow(spark, defPath, out, opts.get("secret"))
      println(s"[graft] household definitions encoded: households=$n")
      return
    }

    val transcripts = opts.get("synthetic") match {
      case Some(n) => SynthTranscripts.transcripts(spark,
        SynthTranscripts.Config(nConvs = n.toInt)).toDF
      case None =>
        val in = opts.getOrElse("input",
          throw new IllegalArgumentException("--input or --synthetic required"))
        if (new java.io.File(s"$in/data").isDirectory ||
            in.endsWith("/data")) TableIO.read(spark, in)
        else spark.read.parquet(in)
    }

    val cfg = Pipeline.Config(
      ccOptions = Cluster.Options(checkpointDir = opts.get("checkpoint")),
      metricsPath = Some(s"$out/metrics"),
      exactAddresses = opts.contains("exact-addresses"),
      pairsFile = opts.get("pairsfile"),
      bucketedRecords = opts.get("buckets")
        .map(n => ("graft_records_bucketed", n.toInt)),
      maxTurns = opts.get("max-turns").map(_.toInt).getOrElse(0))
    // --previous <outdir of an earlier run>: daily-append mode. Fold and
    // score ONLY the new transcripts, candidates restricted to pairs
    // touching a new record, CC over previous ∪ new matches — labels
    // provably equal a full recompute (IncrementalSpec); the increment
    // costs O(new × blocked-neighborhood), not O(corpus²).
    val result = opts.get("previous") match {
      case Some(prev) =>
        // the result's records/matched_pairs plans READ prev's tables;
        // writing them back to the same dir would overwrite a path being
        // read from (the self-overwrite class CLAUDE.md documents) —
        // daily appends alternate output dirs (or snapshot generations).
        // Canonicalize through Hadoop, not java.io.File: the same store
        // spelled with and without a scheme (hdfs://nn/store vs /store)
        // is one path to the FileSystem but two distinct local-File
        // canonical strings, which would bypass this guard exactly where
        // it matters (ADVICE r04)
        val hconf = spark.sparkContext.hadoopConfiguration
        val qual = (p: String) => {
          val hp = new org.apache.hadoop.fs.Path(p)
          hp.getFileSystem(hconf).makeQualified(hp).toString
        }
        require(qual(prev) != qual(out),
          s"--output must differ from --previous ($prev): the incremental " +
            "result reads the previous tables lazily and overwriting them " +
            "mid-read corrupts the cumulative store")
        require(!opts.contains("pairsfile") && !opts.contains("buckets"),
          "--pairsfile/--buckets are not supported with --previous " +
            "(the incremental path neither bypasses scoring nor buckets " +
            "the attribute side)")
        val prevRecords = TableIO.read(spark, s"$prev/records")
        val prevMatches = TableIO.read(spark, s"$prev/matched_pairs")
        Pipeline.incremental(spark, prevRecords, prevMatches, transcripts, cfg)
      case None => Pipeline.run(spark, transcripts, cfg)
    }

    TableIO.write(result.records.drop("turns"), s"$out/records")
    TableIO.write(result.matchedPairs, s"$out/matched_pairs")
    TableIO.write(result.clusters, s"$out/clusters")
    // households metadata document (households.py:370–390 analog)
    Extract.writeMetadata(spark, Map(
      "number_of_households" -> result.clusters.count().toString,
      "households_inferred" -> "true"), s"$out/households_metadata.json")
    // comma-joined ids only at the CSV edge (households.py:268–276 shape)
    result.clusters.select(col("cluster_id"),
        concat_ws(",", col("members")).as("record_ids"), col("size"))
      .coalesce(1).write.mode("overwrite").option("header", "true")
      .csv(s"$out/mapping_csv")

    if (opts.contains("testrun")) {
      val (perMember, perHousehold) = Output.scoringFiles(result.labeledRecords)
      TableIO.write(perMember, s"$out/hh_pos_patids")
      TableIO.write(perHousehold, s"$out/household_pos_pid")
    }
    opts.get("secret").foreach { secret =>
      val clks = Garble.householdClks(result.clusters, secret)
      Garble.writeClksJson(
        clks.withColumnRenamed("cluster_id", "conv_id"), s"$out/household_clks")
    }
    println(s"[graft] linkage complete: " +
      s"${result.metrics.collect().map(r => s"${r.getString(0)}=${r.getLong(1)}")
        .mkString(", ")}")
    result.unpersist() // release the run's internal cache handles
  }
}
