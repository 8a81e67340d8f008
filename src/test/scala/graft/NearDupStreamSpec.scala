package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.NearDupStream

/** Streaming near-dup dedup: batch-2 docs that near-duplicate stored
  * batch-1 docs (or smaller ids in their own batch) are refused; the
  * signature store accumulates only admitted docs. */
class NearDupStreamSpec extends AnyFunSuite with SparkFixture {

  private def doc(seed: Int): String =
    (0 until 40).map(i => s"tok${(i * 7 + seed * 13) % 97}").mkString(" ")

  private lazy val dir =
    java.nio.file.Files.createTempDirectory("neardupstream").toString

  test("micro-batches dedup against the persisted store and themselves") {
    import spark.implicits._
    val store = s"$dir/store"
    val b1 = Seq((1L, doc(1)), (2L, doc(2)), (3L, doc(3)))
      .toDF("doc_id", "text")
    val s1 = NearDupStream.nearDupBatch(b1, store)
    assert(s1.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L, 3L))
    s1.unpersist()

    val b2 = Seq(
      (10L, doc(1).replaceFirst("tok20", "EDITED")), // near-dup of stored 1
      (11L, doc(7)),                                 // novel
      (12L, doc(2)),                                 // exact copy of stored 2
      (13L, doc(7).replaceFirst("tok90", "EDITED"))  // near-dup of 11 (same batch)
    ).toDF("doc_id", "text")
    val s2 = NearDupStream.nearDupBatch(b2, store)
    assert(s2.select("doc_id").collect().map(_.getLong(0)).toSet == Set(11L),
      "10/12 must lose to the store, 13 to its smaller in-batch sibling")
    s2.unpersist()

    // the store holds signatures for admitted docs only
    val stored = spark.read.parquet(store)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(stored == Set(1L, 2L, 3L, 11L))
  }

  test("foreachBatch sink admits exactly the non-duplicates") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = NearDupStream.nearDupSink(
      input.toDF().toDF("doc_id", "text"),
      s"$dir/sinkstore", s"$dir/sinkout", s"$dir/sinkckpt")
    try {
      input.addData((100L, doc(50)), (101L, doc(51)))
      q.processAllAvailable()
      input.addData((102L, doc(50).replaceFirst("tok63", "EDITED")),
        (103L, doc(52)))
      q.processAllAvailable()
    } finally q.stop()
    val admitted = spark.read.parquet(s"$dir/sinkout")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admitted == Set(100L, 101L, 103L),
      s"102 duplicates stored 100; admitted: $admitted")
  }
}
