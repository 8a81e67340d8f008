package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.linkage._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: full linkage pipeline (fold → block → pair → score → CC →
    * clusters) over a deterministic synthetic transcript corpus
    * (SURVEY.md §3.1). Driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame = {
    val cfg = SynthTranscripts.Config(seed = 42L, nConvs = 300)
    val transcripts = SynthTranscripts.transcripts(spark, cfg).toDF
    Pipeline.run(spark, transcripts).clusters
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracle
}
