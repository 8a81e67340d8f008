package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.linkage._
import graft.streaming.LinkageStream

/** Continuous linkage sink: per-micro-batch incremental linkage against
  * an alternating-generation store must equal a full recompute over
  * everything streamed so far, and committed batches must be replay-safe
  * (the restart path of a foreachBatch checkpoint). */
class LinkageStreamSpec extends AnyFunSuite with SparkFixture {

  private lazy val dir =
    java.nio.file.Files.createTempDirectory("linkstream").toString

  test("streamed batches converge to the full-recompute clusters") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val cfg = SynthTranscripts.Config(seed = 7L, nConvs = 250)
    val all = SynthTranscripts.transcripts(spark, cfg).cache()
    // split by seed-conversation so garbles often cross the batch
    // boundary (the increment must still find cross-batch matches)
    val seedId = regexp_extract(col("conv_id"), "^(c\\d+)", 1)
    val inB2 = pmod(xxhash64(seedId), lit(3)) === 0
    val t1 = all.filter(!inB2 || col("conv_id").contains("~")).collect()
    val t2 = all.filter(inB2 && !col("conv_id").contains("~")).collect()
    assert(t2.nonEmpty)

    val input = MemoryStream[Turn]
    val q = LinkageStream.linkageSink(input.toDF(), s"$dir/store",
      s"$dir/ckpt")
    try {
      input.addData(t1.toSeq)
      q.processAllAvailable()
      input.addData(t2.toSeq)
      q.processAllAvailable()
    } finally q.stop()

    val full = Pipeline.run(spark, all.toDF)
    val ca = full.clusters.select(col("cluster_id"), col("members"))
    val cb = LinkageStream.currentClusters(spark, s"$dir/store")
      .select(col("cluster_id"), col("members"))
    assert(ca.exceptAll(cb).isEmpty && cb.exceptAll(ca).isEmpty,
      s"full=${ca.count()} streamed=${cb.count()}")
    full.unpersist()

    // replay safety: re-linking an already-committed batch id is a no-op
    val st0 = LinkageStream.readState(spark, s"$dir/store").get
    val replayed = LinkageStream.linkBatch(
      all.toDF.limit(10), st0.batch, s"$dir/store")
    assert(!replayed, "committed batch id must be skipped")
    assert(LinkageStream.readState(spark, s"$dir/store").get == st0,
      "replay must not move the store pointer")
    // and an empty batch commits nothing
    assert(!LinkageStream.linkBatch(
      all.toDF.limit(0), st0.batch + 100, s"$dir/store"))
    assert(LinkageStream.readState(spark, s"$dir/store").get == st0)
    all.unpersist()
  }
}
