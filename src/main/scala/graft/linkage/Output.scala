package graft.linkage

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cluster assembly + reference-shaped outputs and resolve joins
  * (households.py:182–283; linkid_to_patid.py; SURVEY.md §2.4 A8/A9,
  * §2.3 J4/J5).
  *
  * Deviation (SURVEY.md §7.5): the reference picks the household's display
  * row by shuffled first-visit (households.py:226–249, deliberately
  * nondeterministic); we take min_by(conv_id) — deterministic, cluster
  * contents identical.
  */
object Output {

  /** One row per cluster: sorted members, representative fields, size
    * (A8/A9). `labeled` = records + cluster_id.
    *
    * Scale note: the members list is the reference's own output shape
    * (households.py:268–276) and is naturally bounded by household size;
    * a degenerate giant component would make one fat row here — upstream
    * the 2% block cap and the 0.95 addr prefilter are what keep
    * components household-sized. */
  def clusters(labeled: DataFrame): DataFrame =
    labeled.groupBy(col("cluster_id"))
      .agg(
        sort_array(collect_list(col("conv_id"))).as("members"),
        count(lit(1)).as("size"),
        min_by(
          struct(col("family_name"), col("phone_number"),
            col("addr").getField("full").as("household_street_address"),
            col("household_zip")),
          col("conv_id")).as("rep"))
      .select(col("cluster_id"), col("members"), col("size"),
        col("rep.family_name"), col("rep.phone_number"),
        col("rep.household_street_address"), col("rep.household_zip"))

  /** Reference-shaped mapping file (HOUSEHOLD_POSITION, PII_POSITIONS) —
    * positions assigned by [[Positions.withPosition]] (scale-safe W2:
    * identical to a global row_number, households.py:190–193, without
    * moving the corpus to one partition). `labeled` must carry conv_id +
    * cluster_id. */
  def mappingFile(labeled: DataFrame): DataFrame = {
    val pos = Positions.withPosition(labeled, col("conv_id"), "position")
    val hh = pos.groupBy(col("cluster_id"))
      .agg(sort_array(collect_list(col("position"))).as("positions"))
    Positions.withPosition(hh, col("cluster_id"), "HOUSEHOLD_POSITION")
      .select(col("HOUSEHOLD_POSITION"),
        concat_ws(",", col("positions")).as("PII_POSITIONS"))
  }

  /** J4: LINK_ID → record id via positional join (linkid_to_patid.py:84–90;
    * the +1 header offset collapses to equal row_number bases). */
  def resolveLinks(links: DataFrame, orderedIds: DataFrame): DataFrame = {
    val pos = Positions.withPosition(orderedIds, col("conv_id"), "position")
    links.join(pos, Seq("position"))
      .select(col("LINK_ID"), col("conv_id").as("PATID"))
  }

  /** J5: household links → one row per member id
    * (linkid_to_patid.py:114–131: split + explode). */
  def resolveHouseholdLinks(hhLinks: DataFrame,
                            households: DataFrame): DataFrame =
    hhLinks.join(households, Seq("HOUSEHOLD_POSITION"))
      .select(col("HOUSEHOLD_ID"),
        explode(split(col("record_ids"), ",")).as("PATID"))

  /** --testrun scoring files (households.py:261–265, 345–347):
    * `hh_pos_patids` = (household_position, pid) one row per member;
    * `household_pos_pid` = (household_position, pid) one row per
    * household with the representative's id. */
  def scoringFiles(labeled: DataFrame): (DataFrame, DataFrame) = {
    val agg = labeled.groupBy(col("cluster_id"))
      .agg(sort_array(collect_list(col("conv_id"))).as("members"),
        min(col("conv_id")).as("rep"))
    val hh = Positions.withPosition(agg, col("cluster_id"),
      "household_position")
    val perMember = hh.select(col("household_position"),
      explode(col("members")).as("pid"))
    val perHousehold = hh.select(col("household_position"),
      col("rep").as("pid"))
    (perMember, perHousehold)
  }

  /** Household-size stats (describe analog, households.py:278–281). */
  def sizeStats(clustersDf: DataFrame): DataFrame =
    clustersDf.select(col("size").cast("double").as("size")).summary()
}
