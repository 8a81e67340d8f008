package graft.linkage

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end linkage pipeline (reference flagship `households.py`
  * lifecycle, SURVEY.md §3.1):
  *
  *   transcripts ──fold──▶ records ──block──▶ candidate pairs
  *     ──score──▶ matches ──CC──▶ clusters ──▶ outputs + metrics
  *
  * Shuffle inventory (each deliberate): #1 fold groupBy(conv_id);
  * #2 candidate self-join on blocking keys (salted + capped); #3 pair
  * attribute joins on conv_id; #4..k CC rounds (checkpointed);
  * #k+1 cluster aggregation. Node ids inside CC are xxhash64(conv_id)
  * (collision odds n²/2⁶⁴ — negligible below ~10⁹ records; swap for a
  * 128-bit id at full 10¹² scale).
  */
object Pipeline {

  case class Config(
      passes: Seq[Blocking.Pass] = Blocking.defaultPasses,
      candidates: Candidates.Config = Candidates.Config(),
      ccOptions: Cluster.Options = Cluster.Options(),
      metricsPath: Option[String] = None,
      /** exact-address mode (matching.py:401–402, 333–335): block on
        * [zip, full text]; candidate links ARE the matches, no scoring. */
      exactAddresses: Boolean = false,
      /** pre-computed matched pairs (households.py --pairsfile): skip
        * blocking + scoring entirely. `.csv` → the reference's own format
        * (headerless two-column, households.py:92–93 / matching.py:305);
        * otherwise parquet, whose id_a/id_b columns are selected BY NAME
        * (round 2 trusted positional column order). */
      pairsFile: Option[String] = None,
      /** (tableName, numBuckets): persist the folded records (minus the
        * fat turns array) as a conv_id-bucketed catalog table and run the
        * pair-attribute joins (J7) against it. The bucketed side joins
        * with NO Exchange — at 100 TB the pairs relation scales with the
        * corpus, broadcasting it stops being possible, and the records
        * structs must not move; bucketing moves them exactly once, at
        * write time. Below broadcast scale the in-memory path is faster
        * (no table write), so bucketing turns itself on at
        * [[autoBucketThreshold]] records when unset here. */
      bucketedRecords: Option[(String, Int)] = None,
      /** Records count at which the default run auto-switches to a
        * bucketed attribute side (writes a run-unique
        * "graft_records_auto_<id>" table).
        * Below it the pairs relation is comfortably broadcast-sized and
        * the table write would be pure overhead. */
      autoBucketThreshold: Long = 1000000L,
      /** Node-id domain for connected components. true (default): 64-bit
        * xxhash64(conv_id) — cheapest shuffles; collision odds n²/2⁶⁴ are
        * negligible below ~10⁹ records. false: the conv_id strings
        * themselves — collision-free at any scale (the >10⁹ setting),
        * paying wider shuffle keys. */
      hashNodeIds: Boolean = true,
      /** Runaway-conversation guard (Fold.fold maxTurns): > 0 keeps only
        * the maxTurns lowest-turn_idx turns per conversation before the
        * fold, bounding the per-conversation aggregation buffer a
        * pathological agent loop would otherwise blow up. Truncation
        * BREAKS the per-turn equality invariant for the truncated
        * conversations by design — default off. */
      maxTurns: Int = 0)

  case class Result(
      records: DataFrame,
      candidatePairs: DataFrame,
      scoredPairs: DataFrame,
      matchedPairs: DataFrame,
      labeledRecords: DataFrame,
      clusters: DataFrame,
      metrics: DataFrame,
      /** Internal cache handles (records/scored/CC labels). The library
        * persists exactly these during a run; callers release them when
        * done with the Result's DataFrames via [[unpersist]] — the round-2
        * API gave callers no handle and leaked them for the session. */
      cached: Seq[DataFrame] = Nil,
      /** The run-unique auto-bucketed records table, when the auto path
        * wrote one. Dropped by [[unpersist]] — run-unique names never
        * overwrite each other, so without the drop every auto-bucketed
        * run would leak a full records copy into the warehouse.
        * User-named bucketedRecords tables are caller-owned and never
        * dropped here. */
      autoBucketTable: Option[String] = None,
      /** Incremental runs only: the increment's OWN folded records
        * (piiCols shape) and newly found matches — what an append-only
        * store (LinkageStream's delta logs) writes per batch, O(new)
        * rows where `records`/`matchedPairs` are the O(corpus)
        * cumulative views. None on full runs (the full result IS the
        * delta there). */
      deltaRecords: Option[DataFrame] = None,
      deltaMatches: Option[DataFrame] = None) {
    def unpersist(): Unit = {
      cached.foreach(_.unpersist(false))
      autoBucketTable.foreach(t =>
        records.sparkSession.sql(s"DROP TABLE IF EXISTS `$t`"))
    }
  }

  /** PII record columns every stage downstream of fold actually consumes
    * (blocking: household_zip/addr/family_name; scoring: family_name/
    * phone_number/addr; outputs: those + given_name/DOB/sex passthrough).
    * This is the COMMON schema across every documented records source —
    * Fold.fold output (which adds turns + timestamp ts_min/ts_max), the
    * conv_id-bucketed table (no turns), and TranscriptStream.toRecords
    * (no turns, day-string ts_min/ts_max). */
  val piiCols: Seq[String] = Seq("conv_id", "given_name", "family_name",
    "DOB", "sex", "phone_number", "household_zip", "addr")

  def run(spark: SparkSession, transcripts: DataFrame,
          cfg: Config = Config()): Result = {
    val records = Fold.fold(transcripts, cfg.maxTurns)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nRecords = records.count() // materializes the persist

    // shuffle-free attribute side: write the folded records once, bucketed
    // on the join key; every equi-join on conv_id then reads the table
    // bucket-local (EnsureRequirements elides the Exchange). Explicit via
    // cfg.bucketedRecords, or automatic once the corpus outgrows the
    // broadcast-friendly regime (the default 100-TB run must not lean on
    // broadcasting a corpus-proportional pairs relation).
    val (attrSide, autoTable) = cfg.bucketedRecords match {
      case Some((table, buckets)) =>
        TableIO.writeBucketed(records.drop("turns"), table, "conv_id", buckets)
        (TableIO.readTable(spark, table), None)
      case None if nRecords >= cfg.autoBucketThreshold =>
        val buckets = math.min(4096,
          math.max(32, (nRecords / 250000L).toInt))
        // run-unique name: two concurrent runs sharing one warehouse must
        // not clobber each other's auto table (the fixed name did); the
        // Result carries the name so unpersist() drops it — run-unique
        // tables never overwrite, so they must not outlive the run
        val table = "graft_records_auto_" +
          java.util.UUID.randomUUID().toString.replace("-", "").take(10)
        TableIO.writeBucketed(records.drop("turns"), table,
          "conv_id", buckets)
        (TableIO.readTable(spark, table), Some(table))
      case None => (records, None)
    }

    val passes = if (cfg.exactAddresses) Blocking.exactPasses else cfg.passes
    val pairs = cfg.pairsFile match {
      case Some(path) => loadPairs(spark, path)
      case None => Candidates.candidates(attrSide, passes, cfg.candidates)
    }
    val (scored, matched, scoredHandle) =
      if (cfg.pairsFile.isDefined || cfg.exactAddresses) {
        // exact mode: candidate links are already all pairs with equal
        // [zip, address] (matching.py:333–335) — no similarity scoring
        (pairs, pairs, Nil)
      } else {
        val sc = Scoring.scorePairs(attrSide, pairs)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        (sc, Scoring.matches(sc), Seq(sc))
      }

    val (labeled, labels) = clusterAndLabel(spark, records, matched, cfg)
    val clustersDf = Output.clusters(labeled)

    val metrics = metricsDf(spark, Seq(
      ("records", nRecords),
      ("candidate_pairs", pairs.count()),
      ("scored_pairs_past_addr_prefilter", scored.count()),
      ("matched_pairs", matched.count()),
      ("clusters", clustersDf.count())))
    cfg.metricsPath.foreach(p => TableIO.write(metrics, p))

    Result(records, pairs, scored, matched, labeled, clustersDf, metrics,
      cached = Seq(records) ++ scoredHandle ++ Seq(labels),
      autoBucketTable = autoTable)
  }

  /** --pairsfile loader (households.py:92–93): `.csv` is the reference's
    * headerless two-column format (matching.py:305 reads index_col=[0,1],
    * header=None — column position IS the format); anything else is
    * parquet with id_a/id_b selected by name. */
  private[linkage] def loadPairs(spark: SparkSession, path: String)
      : DataFrame =
    if (path.endsWith(".csv")) {
      val raw = spark.read.option("header", "false").csv(path)
      require(raw.columns.length == 2,
        s"pairs CSV $path must have exactly 2 columns " +
          s"(reference format, matching.py:305); found ${raw.columns.length}")
      raw.toDF("id_a", "id_b")
    } else {
      val p = spark.read.parquet(path)
      require(p.columns.contains("id_a") && p.columns.contains("id_b"),
        s"pairs parquet $path must carry id_a and id_b columns; " +
          s"found [${p.columns.mkString(", ")}]")
      p.select("id_a", "id_b")
    }

  /** CC over the matched pairs + label every record (singletons keep
    * their own id). Node ids are xxhash64(conv_id) by default or the raw
    * conv_id strings (cfg.hashNodeIds=false, the >10⁹-records setting) —
    * either way the human-readable cluster id is min(conv_id). Returns
    * (labeled records, labels cache handle). */
  private def clusterAndLabel(spark: SparkSession, records: DataFrame,
                              matched: DataFrame, cfg: Config)
      : (DataFrame, DataFrame) = {
    val (withNode, edges) =
      if (cfg.hashNodeIds)
        (records.withColumn("node_id", xxhash64(col("conv_id"))),
          matched.select(xxhash64(col("id_a")).as("a"),
            xxhash64(col("id_b")).as("b")))
      else
        (records.withColumn("node_id", col("conv_id")),
          matched.select(col("id_a").as("a"), col("id_b").as("b")))
    val labels = Cluster.connectedComponents(spark, edges, cfg.ccOptions)
    val labeledByNode = Cluster.labelRecords(withNode, labels)
    // human-readable cluster id: min conv_id in the cluster
    val clusterName = labeledByNode.groupBy(col("cluster_id"))
      .agg(min(col("conv_id")).as("cluster_key"))
    val labeled = labeledByNode.join(clusterName, Seq("cluster_id"))
      .drop("cluster_id").withColumnRenamed("cluster_key", "cluster_id")
    (labeled, labels)
  }

  /** Incremental linkage — the daily-increment path a 100-TB deployment
    * needs: fold ONLY the new transcripts, generate candidates restricted
    * to pairs touching a new record, score only those, and run CC over
    * the union of previous matches and new matches. Old-old pairs are
    * never refolded or rescored (scoring is deterministic, so their
    * matches are `previousMatches` verbatim); the whole increment costs
    * O(new × blocked-neighborhood), not O(corpus²).
    *
    * Equivalence: labels equal a full run over the combined corpus, with
    * one documented divergence — a block that crosses the 2% cap only
    * AFTER the increment keeps the matches found while it was under the
    * cap (a full run drops the whole block). Matches found are never
    * retracted, which is the behavior an append-only deployment wants.
    *
    * `existingRecords` is the previous run's folded records from ANY of
    * the documented sources — Result.records (still carrying turns +
    * timestamp ts_min/ts_max), the conv_id-bucketed table (no turns), or
    * TranscriptStream.toRecords output (no turns, day-string ts_min/
    * ts_max); both sides are projected to the common [[piiCols]] schema
    * before the union, so the source shapes interoperate.
    * `previousMatches` is the previous run's matched pairs. */
  def incremental(spark: SparkSession, existingRecords: DataFrame,
                  previousMatches: DataFrame, newTranscripts: DataFrame,
                  cfg: Config = Config()): Result = {
    val newRecords = Fold.fold(newTranscripts, cfg.maxTurns)
      .select(piiCols.map(col): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val all = existingRecords.select(piiCols.map(col): _*)
      .unionByName(newRecords)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val passes = if (cfg.exactAddresses) Blocking.exactPasses else cfg.passes
    val pairs = Candidates.incrementalCandidates(all, newRecords, passes,
      cfg.candidates)
    val scored = Scoring.scorePairs(all, pairs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val newMatches = Scoring.matches(scored)
    // no overlap to dedup across the union in practice — incremental
    // candidates always touch a new record, previous matches never do —
    // but keep the belt: a caller-supplied previousMatches overlapping
    // the increment must not double-count
    val matched = previousMatches
      .unionByName(newMatches)
      .dropDuplicates("id_a", "id_b")

    val (labeled, labels) = clusterAndLabel(spark, all, matched, cfg)
    val clustersDf = Output.clusters(labeled)

    val metrics = metricsDf(spark, Seq(
      ("new_records", newRecords.count()),
      ("records", all.count()),
      ("incremental_candidate_pairs", pairs.count()),
      ("matched_pairs", matched.count()),
      ("clusters", clustersDf.count())))
    cfg.metricsPath.foreach(p => TableIO.write(metrics, p))

    Result(all, pairs, scored, matched, labeled, clustersDf, metrics,
      cached = Seq(newRecords, all, scored, labels),
      deltaRecords = Some(newRecords), deltaMatches = Some(newMatches))
  }

  private def metricsDf(spark: SparkSession,
                        rows: Seq[(String, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("metric", "value")
  }

  /** Pairwise P/R/F1 vs an answer key, restricted to labeled pairs at the
    * same blocking key (north rule; reference hh_score.py:50–58).
    * Truth = intra-cluster pairs from the key that share ≥1 blocking key.
    */
  def pairwiseF1(records: DataFrame, matched: DataFrame,
                 answerKey: DataFrame,
                 passes: Seq[Blocking.Pass] = Blocking.defaultPasses)
      : (Double, Double, Double) = {
    val keyedAll = passes.map(p => Blocking.keyed(records, p))
      .reduce(_ unionByName _)
    val l = keyedAll.toDF("pass", "block_key", "id_a")
    val r = keyedAll.toDF("pass_b", "block_key_b", "id_b")
    val sameBlock = l.join(r,
        col("pass") === col("pass_b") &&
        col("block_key") === col("block_key_b") &&
        col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()

    val ka = answerKey.select(col("conv_id").as("id_a"),
      col("cluster_id").as("ca"))
    val kb = answerKey.select(col("conv_id").as("id_b"),
      col("cluster_id").as("cb"))
    val truth = sameBlock.join(ka, Seq("id_a")).join(kb, Seq("id_b"))
      .filter(col("ca") === col("cb"))
      .select("id_a", "id_b")

    val tp = matched.join(truth, Seq("id_a", "id_b"), "left_semi").count()
    val predicted = matched.count()
    val actual = truth.count()
    val precision = if (predicted == 0) 1.0 else tp.toDouble / predicted
    val recall = if (actual == 0) 1.0 else tp.toDouble / actual
    val f1 = if (precision + recall == 0) 0.0
             else 2 * precision * recall / (precision + recall)
    (precision, recall, f1)
  }
}
