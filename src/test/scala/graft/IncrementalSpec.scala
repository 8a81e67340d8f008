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
}
