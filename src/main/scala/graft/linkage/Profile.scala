package graft.linkage

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data profiling — reference `data_analysis.py` (SURVEY.md §2.4 A1–A7,
  * §2.2 P10/P11): per-field reports over the folded records table.
  * Every report is a single aggregation job; the ≥3 min-count guard
  * mirrors the reference's PII-spill guard (data_analysis.py:139–155).
  */
object Profile {

  /** A1: value frequencies, top-N, counts < minCount suppressed. */
  def valueCounts(df: DataFrame, field: String, topN: Int = 10,
                  minCount: Long = 3): DataFrame =
    df.groupBy(col(field)).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .orderBy(col("cnt").desc, col(field))
      .limit(topN)

  /** A2: duplicate ids, with the reference's <20% PII-spill guard
    * COMPUTED (data_analysis.py:46–50): dup_share_ok is true only when
    * 0 < |dup ids| < 20% of unique ids — the regime where reporting
    * individual ids is allowed. (Analyze.analyze enforces the same guard
    * when assembling the private report.) */
  def duplicateIds(df: DataFrame, idField: String): DataFrame = {
    // the counts aggregation runs twice (guard scalars + the report) —
    // leak-free beats cached here: persisting inside a utility that the
    // caller may never unpersist bleeds blocks across a session
    val counts = df.groupBy(col(idField)).agg(count(lit(1)).as("cnt"))
    val stats = counts.agg(
      count(lit(1)).as("uniq"),
      count(when(col("cnt") > 1, 1)).as("dups"),
      coalesce(sum(col("cnt")), lit(0L)).as("total")).head()
    val (uniq, dups, total) =
      (stats.getLong(0), stats.getLong(1), stats.getLong(2))
    counts
      .filter(col("cnt") > 1)
      .withColumn("dup_share_ok", lit(dups > 0 && dups < uniq * 0.2))
      .orderBy(col("cnt").desc, col(idField))
      .withColumn("total_records", lit(total))
  }

  /** A3: min / max / missing for a date-like string field. */
  def minMaxMissing(df: DataFrame, field: String): DataFrame =
    df.agg(min(col(field)).as("min_val"), max(col(field)).as("max_val"),
      sum(when(col(field).isNull || trim(col(field)) === "", 1)
        .otherwise(0)).as("n_missing"))

  /** A4: length summary (count/mean/std/min/quantiles/max). */
  def lengthSummary(df: DataFrame, field: String): DataFrame =
    df.select(length(col(field)).cast("double").as("len")).summary()

  /** A5: character histogram. */
  def charHistogram(df: DataFrame, field: String): DataFrame =
    df.select(explode(split(col(field), "")).as("ch"))
      .filter(col("ch") =!= "")
      .groupBy(col("ch")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("ch"))

  /** P10: shape profile — digits→#, letters→X. */
  def formatMask(df: DataFrame, field: String): DataFrame =
    df.select(regexp_replace(regexp_replace(col(field), "[0-9]", "#"),
        "[A-Za-z]", "X").as("mask"))
      .groupBy(col("mask")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("mask"))

  /** A6: blank-aware missing counts for every string field at once. */
  def missingReport(df: DataFrame, fields: Seq[String]): DataFrame = {
    val aggs = fields.map(f =>
      sum(when(col(f).isNull || trim(col(f)) === "", 1).otherwise(0))
        .as(s"${f}_missing"))
    df.agg(aggs.head, aggs.tail: _*)
  }
}
