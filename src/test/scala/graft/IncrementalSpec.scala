package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.linkage._

/** Incremental linkage: folding + scoring only the increment must yield
  * labels identical to a full recompute over the combined corpus —
  * including matches that CROSS the increment boundary (a garbled
  * duplicate arriving after its seed). */
class IncrementalSpec extends AnyFunSuite with SparkFixture {

  test("incremental(T1 then +T2) == full(T1 ∪ T2)") {
    val cfg = SynthTranscripts.Config(seed = 7L, nConvs = 400)
    val transcripts =
      SynthTranscripts.transcripts(spark, cfg).toDF.cache()
    // split by seed-conversation hash so garbles and their seeds often
    // land in DIFFERENT increments (cross-boundary matches required);
    // garble ids look like "c123~g1" — split on the seed part
    val seedId = regexp_extract(col("conv_id"), "^(c\\d+)", 1)
    val inT2 = pmod(xxhash64(seedId), lit(3)) === 0
    val t1 = transcripts.filter(!inT2 ||
      col("conv_id").contains("~")) // seeds mostly in T1...
    val t2 = transcripts.filter(inT2 && !col("conv_id").contains("~"))
    assert(t2.select("conv_id").distinct().count() > 0)

    val full = Pipeline.run(spark, transcripts)
    val first = Pipeline.run(spark, t1)
    val inc = Pipeline.incremental(spark,
      first.records, first.matchedPairs, t2)

    // identical cluster CONTENTS (cluster ids are min conv_id per
    // cluster in both paths, so the labeled sets compare directly)
    val a = full.labeledRecords.select("conv_id", "cluster_id")
    val b = inc.labeledRecords.select("conv_id", "cluster_id")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      s"full=${a.count()} inc=${b.count()} " +
        s"diff=${a.exceptAll(b).take(5).mkString(",")}")
    // and the matched pair sets agree
    val ma = full.matchedPairs.select("id_a", "id_b")
    val mb = inc.matchedPairs.select("id_a", "id_b")
    assert(ma.exceptAll(mb).isEmpty && mb.exceptAll(ma).isEmpty)
    // the increment only scored pairs touching a new record
    val newIds = Fold.fold(t2).select(col("conv_id")).collect()
      .map(_.getString(0)).toSet
    val touchingNew = inc.candidatePairs.collect().forall(r =>
      newIds.contains(r.getString(0)) || newIds.contains(r.getString(1)))
    assert(touchingNew, "incremental candidates regenerated old-old pairs")
  }

  test("every documented existingRecords shape feeds incremental") {
    // ADVICE r02: round 2 only worked when existingRecords came from
    // Result.records (which still carries turns + timestamp ts_min/
    // ts_max); the bucketed table (no turns) and the streaming fold's
    // toRecords (no turns, day-string ts) threw AnalysisException in the
    // strict unionByName. incremental now projects both sides to the
    // common piiCols schema first.
    val cfg = SynthTranscripts.Config(seed = 23L, nConvs = 150)
    val transcripts = SynthTranscripts.transcripts(spark, cfg).toDF.cache()
    val t1 = transcripts.filter(pmod(xxhash64(col("conv_id")), lit(3)) =!= 0)
    val t2 = transcripts.filter(pmod(xxhash64(col("conv_id")), lit(3)) === 0)
    val first = Pipeline.run(spark, t1)
    val expected = Pipeline.incremental(spark,
      first.records, first.matchedPairs, t2)
      .labeledRecords.select("conv_id", "cluster_id")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

    // shape 1: the conv_id-bucketed table (written without turns)
    TableIO.writeBucketed(first.records.drop("turns"),
      "graft_inc_shape_test", "conv_id", 4)
    val fromTable = Pipeline.incremental(spark,
      TableIO.readTable(spark, "graft_inc_shape_test"),
      first.matchedPairs, t2)
      .labeledRecords.select("conv_id", "cluster_id")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(fromTable == expected)

    // shape 2: the streaming fold's record shape (no turns, day-string
    // ts_min/ts_max) — emulated exactly by projecting + stringifying
    val streamShaped = first.records
      .drop("turns")
      .withColumn("ts_min", date_format(col("ts_min"), "yyyy-MM-dd"))
      .withColumn("ts_max", date_format(col("ts_max"), "yyyy-MM-dd"))
    val fromStream = Pipeline.incremental(spark,
      streamShaped, first.matchedPairs, t2)
      .labeledRecords.select("conv_id", "cluster_id")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(fromStream == expected)
  }
}
