package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.linkage.{Fold, SynthTranscripts, TableIO}

/** Bucketing as the co-located-join path (SURVEY.md §4): a records table
  * bucketed by conv_id joins pairs without shuffling the fat side. */
class BucketedJoinSpec extends AnyFunSuite with SparkFixture {

  test("bucketed records join without exchanging the bucketed side") {
    import spark.implicits._
    val records = Fold.fold(SynthTranscripts
      .transcripts(spark, SynthTranscripts.Config(nConvs = 300)).toDF)
      .drop("turns")
    spark.sql("DROP TABLE IF EXISTS records_bucketed")
    // a previously-failed run can leave the managed location behind
    val loc = new java.io.File("spark-warehouse/records_bucketed")
    if (loc.exists()) {
      import scala.reflect.io.Directory
      new Directory(loc).deleteRecursively()
    }
    TableIO.writeBucketed(records, "records_bucketed", "conv_id", 8)
    val bucketed = TableIO.readTable(spark, "records_bucketed")

    val pairs = Seq(("c1", "c2"), ("c3", "c4")).toDF("id_a", "id_b")
    // force a shuffle join so the bucketed side's partitioning matters
    val joined = pairs.hint("shuffle_merge")
      .join(bucketed, col("id_a") === col("conv_id"))
    joined.collect()
    // AQE's toString appends the "Initial Plan" section too — assert on
    // the final plan only
    val full = joined.queryExecution.executedPlan.toString
    val plan = full.split("== Initial Plan ==").head
    // the bucketed scan must NOT sit under an Exchange: count exchanges
    // below the scan's side — the only hashpartitioning exchange allowed
    // is the pairs side
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 1, s"bucketed side shuffled:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"expected a shuffle-family join:\n$plan")
    assert(plan.toLowerCase.contains("bucket"),
      s"scan not bucketed:\n$plan")
    spark.sql("DROP TABLE IF EXISTS records_bucketed")
  }
}
