package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-contract queries: one per SQL-expressible operator family from
  * SURVEY.md §2, phrased over /root/testdata TPC-H-ish parquet with DuckDB
  * oracle SQL (SURVEY.md §7.7). Column names are aliased identically on
  * both sides — the driver's compare sorts columns by name and hashes.
  */
object Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1/O5: value_counts top-N with min-count guard
    // (data_analysis.py:139–155)
    "q_topn_counts" -> ((s, dir) =>
      t(s, dir, "orders").groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= 3)
        .orderBy(col("cnt").desc, col("o_orderpriority"))
        .limit(3)),
  )

  val oracle: Map[String, String] = Map(
    "q_topn_counts" ->
      """SELECT o_orderpriority, count(*) AS cnt FROM orders
         GROUP BY o_orderpriority HAVING count(*) >= 3
         ORDER BY cnt DESC, o_orderpriority LIMIT 3""",
  )
}
