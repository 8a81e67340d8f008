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

  test("reconcile catches a borderline drop (estimate ≥ t, exact < t)") {
    import spark.implicits._
    import graft.data.Dedup
    val cfg = Dedup.MinHashConfig(oph = true, jaccardThreshold = 0.7)

    // deterministic search for a doc pair whose SIGNATURE-estimated
    // Jaccard crosses the 0.7 gate while the exact shingle Jaccard stays
    // below it — the ±1/√k estimator noise the streaming trade documents
    def exactJac(a: String, b: String): Double = {
      def sh(t: String) = t.split("\\s+").sliding(3).map(_.mkString(" ")).toSet
      val (sa, sb) = (sh(a), sh(b))
      sa.intersect(sb).size.toDouble / sa.union(sb).size
    }
    val base = doc(30)
    val toks = base.split(" ")
    // edit m well-spread tokens starting at offset o: exact Jaccard lands
    // ≈ (38-3m)/(38+3m); m=3 sits at ≈0.62 < t where the ±1/√k estimator
    // noise can still push the signature estimate over t for SOME (o, m)
    val combos = for (m <- 2 to 4; o <- 0 until 12) yield (m, o)
    val variants = combos.map { case (m, o) =>
      val pos = (0 until m).map(j => (o + 11 * j) % toks.length).toSet
      toks.zipWithIndex.map { case (t, i) =>
        if (pos(i)) s"ED$i" else t
      }.mkString(" ")
    }
    // ONE batched signature pass over base + all variants
    val varDf = ((0L, base) +: variants.zipWithIndex.map {
      case (v, i) => (i + 1L, v)
    }).toDF("doc_id", "text")
    val sigMap = Dedup.minHashSignaturesOPH(
      Dedup.explodedShingles(varDf, "doc_id", "text", cfg.shingleSize), cfg)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def est(i: Long): Double =
      sigMap(0L).zip(sigMap(i)).count { case (x, y) => x == y }.toDouble /
        cfg.numHashes
    val borderline = variants.zipWithIndex.find { case (v, i) =>
      est(i + 1L) >= cfg.jaccardThreshold &&
        exactJac(base, v) < cfg.jaccardThreshold
    }
    assert(borderline.isDefined,
      "no borderline variant in the deterministic search window — widen it")
    val edited = borderline.get._1

    val store = s"$dir/reconcilestore"
    val s1 = NearDupStream.nearDupBatch(
      Seq((1L, base)).toDF("doc_id", "text"), store, cfg)
    assert(s1.count() == 1)
    val s2 = NearDupStream.nearDupBatch(
      Seq((2L, edited)).toDF("doc_id", "text"), store, cfg)
    assert(s2.count() == 0, "the estimate should (wrongly) drop doc 2")

    val corpus = Seq((1L, base), (2L, edited)).toDF("doc_id", "text")
    val rec = NearDupStream.reconcileStore(store, corpus, cfg)
    val diffs = rec.collect()
    val falseDrops = diffs.filter(_.getString(3) == "false_drop")
    assert(falseDrops.length == 1 && falseDrops.head.getLong(0) == 2L,
      s"reconcile missed the borderline drop: ${diffs.mkString(";")}")
    assert(falseDrops.head.getDouble(2) < cfg.jaccardThreshold)
    assert(!diffs.exists(_.getString(3) == "false_admit"))
    org.apache.spark.sql.graftbridge.DatasetBridge.releaseCheckpoint(rec)

    // CLI wrapper over the same store
    val cdir = s"$dir/reccorpus"
    corpus.write.mode("overwrite").parquet(cdir)
    val (fa, fd) = graft.streaming.ReconcileMain.run(spark, Map(
      "store" -> store, "corpus" -> cdir, "output" -> s"$dir/recout",
      "jaccard" -> cfg.jaccardThreshold.toString))
    assert(fa == 0L && fd == 1L)
    val persisted = spark.read.parquet(s"$dir/recout/diffs").collect()
    assert(persisted.length == 1 && persisted.head.getString(3) == "false_drop")
  }
}
