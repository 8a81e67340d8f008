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
        * blocking + scoring entirely. */
      pairsFile: Option[String] = None,
      /** (tableName, numBuckets): persist the folded records (minus the
        * fat turns array) as a conv_id-bucketed catalog table and run the
        * pair-attribute joins (J7) against it. The bucketed side joins
        * with NO Exchange — at 100 TB the pairs relation scales with the
        * corpus, broadcasting it stops being possible, and the records
        * structs must not move; bucketing moves them exactly once, at
        * write time. Off by default: below broadcast scale the in-memory
        * path is faster (no table write). */
      bucketedRecords: Option[(String, Int)] = None)

  case class Result(
      records: DataFrame,
      candidatePairs: DataFrame,
      scoredPairs: DataFrame,
      matchedPairs: DataFrame,
      labeledRecords: DataFrame,
      clusters: DataFrame,
      metrics: DataFrame)

  def run(spark: SparkSession, transcripts: DataFrame,
          cfg: Config = Config()): Result = {
    val records = Fold.fold(transcripts)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // optional shuffle-free attribute side: write the folded records once,
    // bucketed on the join key; every equi-join on conv_id then reads the
    // table bucket-local (EnsureRequirements elides the Exchange)
    val attrSide = cfg.bucketedRecords match {
      case Some((table, buckets)) =>
        TableIO.writeBucketed(records.drop("turns"), table, "conv_id", buckets)
        TableIO.readTable(spark, table)
      case None => records
    }

    val passes = if (cfg.exactAddresses) Blocking.exactPasses else cfg.passes
    val pairs = cfg.pairsFile match {
      case Some(path) => // S9-style pre-computed pairs, skip candidates
        spark.read.parquet(path).toDF("id_a", "id_b")
      case None => Candidates.candidates(attrSide, passes, cfg.candidates)
    }
    val (scored, matched) =
      if (cfg.pairsFile.isDefined || cfg.exactAddresses) {
        // exact mode: candidate links are already all pairs with equal
        // [zip, address] (matching.py:333–335) — no similarity scoring
        (pairs, pairs)
      } else {
        val sc = Scoring.scorePairs(attrSide, pairs)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        (sc, Scoring.matches(sc))
      }

    // CC over hashed ids; map back to conv_id afterwards
    val withNode = records.withColumn("node_id", xxhash64(col("conv_id")))
    val edges = matched
      .select(xxhash64(col("id_a")).as("a"), xxhash64(col("id_b")).as("b"))
    val labels = Cluster.connectedComponents(spark, edges, cfg.ccOptions)
    val labeledByNode = Cluster.labelRecords(withNode, labels)
    // human-readable cluster id: min conv_id in the cluster
    val clusterName = labeledByNode.groupBy(col("cluster_id"))
      .agg(min(col("conv_id")).as("cluster_key"))
    val labeled = labeledByNode.join(clusterName, Seq("cluster_id"))
      .drop("cluster_id").withColumnRenamed("cluster_key", "cluster_id")

    val clustersDf = Output.clusters(labeled)

    val metrics = metricsDf(spark, Seq(
      ("records", records.count()),
      ("candidate_pairs", pairs.count()),
      ("scored_pairs_past_addr_prefilter", scored.count()),
      ("matched_pairs", matched.count()),
      ("clusters", clustersDf.count())))
    cfg.metricsPath.foreach(p => TableIO.write(metrics, p))

    Result(records, pairs, scored, matched, labeled, clustersDf, metrics)
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
    * `existingRecords` must be the previous run's folded records (e.g.
    * the conv_id-bucketed table), `previousMatches` its matched pairs. */
  def incremental(spark: SparkSession, existingRecords: DataFrame,
                  previousMatches: DataFrame, newTranscripts: DataFrame,
                  cfg: Config = Config()): Result = {
    val newRecords = Fold.fold(newTranscripts)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val all = existingRecords.unionByName(newRecords)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val passes = if (cfg.exactAddresses) Blocking.exactPasses else cfg.passes
    val pairs = Candidates.incrementalCandidates(all, newRecords, passes,
      cfg.candidates)
    val scored = Scoring.scorePairs(all, pairs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val matched = previousMatches
      .unionByName(Scoring.matches(scored))
      .dropDuplicates("id_a", "id_b")

    val withNode = all.withColumn("node_id", xxhash64(col("conv_id")))
    val edges = matched
      .select(xxhash64(col("id_a")).as("a"), xxhash64(col("id_b")).as("b"))
    val labels = Cluster.connectedComponents(spark, edges, cfg.ccOptions)
    val labeledByNode = Cluster.labelRecords(withNode, labels)
    val clusterName = labeledByNode.groupBy(col("cluster_id"))
      .agg(min(col("conv_id")).as("cluster_key"))
    val labeled = labeledByNode.join(clusterName, Seq("cluster_id"))
      .drop("cluster_id").withColumnRenamed("cluster_key", "cluster_id")
    val clustersDf = Output.clusters(labeled)

    val metrics = metricsDf(spark, Seq(
      ("new_records", newRecords.count()),
      ("records", all.count()),
      ("incremental_candidate_pairs", pairs.count()),
      ("matched_pairs", matched.count()),
      ("clusters", clustersDf.count())))
    cfg.metricsPath.foreach(p => TableIO.write(metrics, p))

    Result(all, pairs, scored, matched, labeled, clustersDf, metrics)
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
