package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.linkage._

/** Physical-plan quality gates (SURVEY.md §4): filters reach the parquet
  * scan, projection prunes columns, the scoring expression tree stays in
  * whole-stage codegen, small sides broadcast, and the candidate
  * self-join is a real equi-join on the blocking key (no cross product).
  */
class PlanSpec extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("parquet scan: predicate pushdown + column pruning") {
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(col("l_quantity") > 30)
      .select("l_orderkey", "l_quantity")
    val plan = planOf(df)
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), " +
      "GreaterThan(l_quantity,30.0)]"), s"no pushdown in:\n$plan")
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint," +
      "l_quantity:double>"), s"no pruning in:\n$plan")
  }

  test("scoring stays inside whole-stage codegen") {
    import spark.implicits._
    val recs = Fold.fold(SynthTranscripts
      .transcripts(spark, SynthTranscripts.Config(nConvs = 50)).toDF)
    val pairs = Seq(("c1", "c2")).toDF("id_a", "id_b")
    val df = Scoring.scorePairs(recs, pairs)
    df.collect() // AQE finalizes the physical plan only on execution
    val plan = planOf(df)
    assert(plan.contains("isFinalPlan=true"))
    // `*(n)` prefixes mark whole-stage-codegen'd operators; the Project
    // that evaluates the jaro_winkler scoring tree must carry one
    val scoringLine = plan.linesIterator
      .find(l => l.contains("jaro_winkler(a_family_name"))
    assert(scoringLine.exists(_.contains("*(")),
      s"scoring projection not codegen'd:\n${scoringLine.getOrElse(plan)}")
    // r06 opaque barrier: the addr prefilter must READ the projected
    // addr_score column, never re-evaluate the comparator tree — a
    // pushed-down filter would carry jaro_winkler calls in its condition
    // (measured: the filter copy of addressDistance doubled the scoring
    // CPU and sank into the join stage)
    val filterLines = plan.linesIterator
      .filter(l => l.contains("Filter") && l.contains("0.95")).toSeq
    assert(filterLines.nonEmpty, s"no addr prefilter in plan:\n$plan")
    assert(filterLines.forall(!_.contains("jaro_winkler")),
      s"addr prefilter re-evaluates the comparator tree:\n" +
        filterLines.mkString("\n"))
  }

  test("broadcast hint honored for small query side (ANN brute force)") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = e.filter(col("vec_id") === 0)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val plan = planOf(graft.data.Ann.bruteForceTopK(e, q, 3))
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), s"no broadcast in:\n$plan")
  }

  test("candidate self-join is an equi-join on the blocking key") {
    val recs = Fold.fold(SynthTranscripts
      .transcripts(spark, SynthTranscripts.Config(nConvs = 50)).toDF)
    val plan = planOf(Candidates.candidates(recs, Blocking.defaultPasses))
    // hash-partitioned equi join (SMJ or SHJ), never a cartesian product
    assert(plan.contains("SortMergeJoin") ||
      plan.contains("ShuffledHashJoin") || plan.contains("BroadcastHashJoin"),
      s"no equi-join operator in:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"cartesian product in candidate join:\n$plan")
  }

  test("positions: row_number-identical values, no global window") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // 5000 shuffled keys across many partitions
    val df = spark.range(5000)
      .select(concat(lit("k"), format_string("%06d",
        pmod(col("id") * 2654435761L, lit(5000)))).as("conv_id"))
      .distinct()
      .repartition(16)
    val scalable = Positions.withPosition(df, col("conv_id"), "pos")
      .select("conv_id", "pos")
    val windowed = df.withColumn("pos",
      (row_number().over(Window.orderBy(col("conv_id"))) - 1).cast("long"))
    assert(scalable.exceptAll(windowed).isEmpty &&
      windowed.exceptAll(scalable).isEmpty)
    // the plan must not contain a Window at all (the single-partition
    // global sort was round 1's scale-killer at the output edges)
    assert(!planOf(scalable).contains("Window"),
      s"global window leaked into positions plan")
    // same for the output-edge consumers
    val labeled = df.withColumn("cluster_id", substring(col("conv_id"), 1, 4))
      .withColumn("family_name", lit("F"))
      .withColumn("phone_number", lit(""))
      .withColumn("household_zip", lit("Z"))
      .withColumn("addr", struct(lit("").as("number"), lit("").as("street"),
        lit("").as("suffix"), lit("").as("prefix"), lit("").as("value"),
        lit("x").as("full")))
    assert(!planOf(Output.mappingFile(labeled)).contains("Window"))
  }

  test("fold is a single-shuffle aggregation (no window, no sort)") {
    val t = SynthTranscripts
      .transcripts(spark, SynthTranscripts.Config(nConvs = 50)).toDF
    val plan = planOf(Fold.fold(t))
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 2, // hashpartition for agg (+AQE read) only
      s"fold shuffles too much ($exchanges exchanges):\n$plan")
    assert(!plan.contains("Window"), s"unexpected window in fold:\n$plan")
  }
}
