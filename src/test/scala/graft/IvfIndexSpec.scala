package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.data.Ann

/** Persisted IVF index: build-once/query-many parity with the in-memory
  * path, and the at-scale property that matters — queries read ONLY the
  * probed cell partitions (dynamic partition pruning from the broadcast
  * probe set). */
class IvfIndexSpec extends AnyFunSuite with SparkFixture {

  private lazy val dir =
    java.nio.file.Files.createTempDirectory("ivfidx").toString

  private lazy val corpus = {
    import spark.implicits._
    // deterministic 64-dim embeddings in 4 well-separated lobes
    (0L until 400L).map { i =>
      val lobe = (i % 4).toInt
      val v = Array.tabulate(64) { d =>
        val base = if (d / 16 == lobe) 1.0f else 0.0f
        base + 0.01f * (((i * 31 + d * 7) % 13) - 6)
      }
      (i, v)
    }.toDF("vec_id", "embedding")
  }

  private lazy val queries = corpus.filter(col("vec_id") < 4)
    .select(col("vec_id").as("query_id"), col("embedding"))

  private val cfg = Ann.IvfConfig(nCentroids = 8, nProbe = 2)
  private lazy val indexReady: Unit = Ann.writeIvfIndex(corpus, dir, cfg)

  test("indexed top-k ≡ in-memory ivfTopK (same centroids, same results)") {
    indexReady
    val mem = Ann.ivfTopK(corpus, queries, k = 5, cfg)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val idx = Ann.ivfTopKIndexed(spark, dir, queries, k = 5, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(idx == mem, s"indexed result diverged: ${idx diff mem}")
    assert(idx.nonEmpty)
    // each query's nearest neighbor set comes from its own lobe
    val top1 = Ann.ivfTopKIndexed(spark, dir, queries, k = 1, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    top1.foreach { case (q, hit) =>
      assert(hit % 4 == q % 4, s"query $q matched cross-lobe vector $hit")
    }
  }

  test("appended vectors are found without rebuilding the quantizer") {
    indexReady
    import spark.implicits._
    // a new vector sitting exactly on lobe-2's prototype
    val novel = Seq((9999L,
      Array.tabulate(64)(d => if (d / 16 == 2) 1.0f else 0.0f)))
      .toDF("vec_id", "embedding")
    Ann.appendToIvfIndex(novel, dir)
    val q = novel.select(col("vec_id").as("query_id"), col("embedding"))
    val top1 = Ann.ivfTopKIndexed(spark, dir, q, k = 1, nProbe = 2)
      .collect()
    assert(top1.length == 1 && top1.head.getLong(1) == 9999L,
      s"appended vector not retrieved: ${top1.mkString}")
  }

  test("index queries prune unprobed cell partitions (DPP in the plan)") {
    indexReady
    val centroids = Ann.readIvfCentroids(spark, dir)
    assert(centroids.length == 8 && centroids.forall(_.length == 64))
    val plan = Ann.ivfTopKIndexed(spark, dir, queries, k = 5, nProbe = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"no dynamic partition pruning on the cells scan:\n$plan")
  }
}
