package graft.linkage

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-site answer-key assembly + household-membership scoring — the
  * reference's tuning tools re-expressed as DataFrame ops:
  *
  *  - build_key.py: flatten the household-keyed answer key and split it
  *    per site by record-id membership;
  *  - answer_key_map.py: per-site (HOUSEHOLD_POSITION → HOUSEHOLD_ID)
  *    mapping through the site key, plus the cross-site household matrix;
  *  - hh_score.py: per-site precision/recall/F over (pid, household_id)
  *    membership pairs.
  *
  * [[Pipeline.pairwiseF1]] carries the north-rule PAIRWISE metric; this
  * is the reference's own household-membership metric family.
  */
object AnswerKeys {

  /** build_key.py:14–69: site-specific answer key = the flattened key
    * (record_id, seed_record_id, household_id, file_name) semi-joined on
    * the site's record ids. */
  def siteKey(answerKey: DataFrame, sitePii: DataFrame): DataFrame =
    answerKey.join(sitePii.select(col("record_id")),
      Seq("record_id"), "left_semi")

  /** answer_key_map.py:42–50: (HOUSEHOLD_POSITION, HOUSEHOLD_ID) — each
    * inferred household position mapped to the true household id of its
    * pid through the site key. `householdPosPid` is Output.scoringFiles'
    * per-household file (position, representative pid). */
  def hidMapping(siteKeyDf: DataFrame,
                 householdPosPid: DataFrame): DataFrame =
    householdPosPid
      .join(siteKeyDf.select(col("record_id").as("pid"),
        col("household_id")), Seq("pid"))
      .select(col("household_position").as("HOUSEHOLD_POSITION"),
        col("household_id").as("HOUSEHOLD_ID"))

  /** answer_key_map.py:52–60 (full_answer_key.csv): which sites hold
    * each true household — one row per household with its sorted site
    * list (the reference writes a sparse per-site-column CSV; the sites
    * array carries identical information without a fixed site schema). */
  def fullAnswerKey(siteKeys: Map[String, DataFrame]): DataFrame =
    siteKeys.map { case (site, k) =>
        k.select(col("household_id"), lit(site).as("site"))
      }
      .reduce(_ unionByName _)
      .distinct()
      .groupBy(col("household_id"))
      .agg(sort_array(collect_set(col("site"))).as("sites"))

  /** hh_score.py:20–58: household-membership precision/recall/F for one
    * site. `hhPosPatids` = (household_position, pid) one row per member.
    * The reference folds that CSV into a dict keyed by position
    * (last row wins — its members are written sorted, so last = max);
    * the deterministic equivalent keeps max(pid) per position. Predicted
    * pairs are (kept pid → mapped HOUSEHOLD_ID); TP = pairs present in
    * the site key; recall divides by the FULL site key size, exactly as
    * the reference does. */
  def householdScore(siteKeyDf: DataFrame, hhPosPatids: DataFrame,
                     hidMappingDf: DataFrame): (Double, Double, Double) = {
    val keptPid = hhPosPatids
      .groupBy(col("household_position"))
      .agg(max(col("pid")).as("pid"))
    val predictions = keptPid
      .join(hidMappingDf.withColumnRenamed("HOUSEHOLD_POSITION",
        "household_position"), Seq("household_position"))
      .select(col("pid").as("record_id"),
        col("HOUSEHOLD_ID").as("household_id"))
    val answer = siteKeyDf.select(col("record_id"), col("household_id"))
      .distinct()
    val tp = predictions.join(answer, Seq("record_id", "household_id"),
      "left_semi").count()
    val predicted = predictions.count()
    val actual = answer.count()
    val precision = if (predicted == 0) 0.0 else tp.toDouble / predicted
    val recall = if (actual == 0) 0.0 else tp.toDouble / actual
    val f = if (precision + recall == 0) 0.0
            else 2 * precision * recall / (precision + recall)
    (precision, recall, f)
  }
}
