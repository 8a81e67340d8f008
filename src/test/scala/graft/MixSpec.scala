package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.data.Mix

/** Deterministic corpus mixing: domain-weighted sampling and per-epoch
  * shuffle order (graft.data.Mix). */
class MixSpec extends AnyFunSuite with SparkFixture {

  private lazy val docs = {
    import spark.implicits._
    (0L until 200L).map(i => (i, s"s${i % 4}", s"doc $i text"))
      .toDF("doc_id", "source", "text")
  }

  test("sampleByDomain keeps exactly the sub-threshold buckets") {
    val out = Mix.sampleByDomain(docs,
        weights = Map("s0" -> 0.0, "s1" -> 1.0, "s2" -> 0.5),
        defaultWeight = 0.8, seed = 11L)
      .select(col("doc_id"), col("source")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val bySource = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(!bySource.contains("s0"), "weight 0 must drop every row")
    assert(bySource("s1") == 50, "weight 1 must keep every row")
    // the kept set is exactly the bucket rule, replayed independently
    val buckets = docs
      .select(col("doc_id"), col("source"),
        Mix.mixBucket(col("doc_id"), 11L).as("b"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expected = buckets.filter { case (_, s, b) =>
      val w = Map("s0" -> 0.0, "s1" -> 1.0, "s2" -> 0.5)
        .getOrElse(s, 0.8)
      b < math.round(w * Mix.Buckets)
    }.map(t => (t._1, t._2)).toSet
    assert(out.toSet == expected)
    // deterministic: a second run returns the identical set
    val again = Mix.sampleByDomain(docs,
        weights = Map("s0" -> 0.0, "s1" -> 1.0, "s2" -> 0.5),
        defaultWeight = 0.8, seed = 11L)
      .select(col("doc_id"), col("source")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(again == out.toSet)
  }

  test("sampleByDomain refuses weights outside [0, 1]") {
    intercept[IllegalArgumentException] {
      Mix.sampleByDomain(docs, weights = Map("s0" -> 1.5))
    }
  }

  test("repeatByDomain emits floor(f) copies plus the fractional rule") {
    val factors = Map("s0" -> 0.0, "s1" -> 2.0, "s2" -> 1.5)
    val out = Mix.repeatByDomain(docs, factors, defaultFactor = 1.0,
        seed = 11L)
      .select(col("doc_id"), col("source"), col("copy_idx")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val copies = out.groupBy(_._1).view
      .mapValues(_.map(_._3).sorted.toSeq).toMap
    val bySource = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(!bySource.contains("s0"), "factor 0 must drop every row")
    assert(bySource("s1") == 100, "factor 2 must emit exactly 2 copies")
    // every emitted doc numbers its copies 0..n-1
    assert(copies.values.forall(c => c == (0L until c.length)))
    // the fractional copy is exactly the bucket rule, independently
    val buckets = docs.select(col("doc_id"), col("source"),
        Mix.mixBucket(col("doc_id"), 11L).as("b")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expected = buckets.flatMap { case (id, s, b) =>
      val f = factors.getOrElse(s, 1.0)
      val n = math.floor(f).toLong +
        (if (b < math.round((f - math.floor(f)) * Mix.Buckets)) 1L else 0L)
      (0L until n).map(c => (id, s, c))
    }.toSet
    assert(out.toSet == expected)
    // subsumes sampling at f < 1: same kept set as sampleByDomain
    val sampled = Mix.sampleByDomain(docs, Map("s2" -> 0.5),
        defaultWeight = 1.0, seed = 11L)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val repeated = Mix.repeatByDomain(docs, Map("s2" -> 0.5),
        defaultFactor = 1.0, seed = 11L)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(repeated == sampled)
  }

  test("repeatByDomain refuses factors outside [0, 100]") {
    intercept[IllegalArgumentException] {
      Mix.repeatByDomain(docs, factors = Map("s0" -> -0.5))
    }
    intercept[IllegalArgumentException] {
      Mix.repeatByDomain(docs, factors = Map("s0" -> 101.0))
    }
  }

  test("epochOrder is a stable per-epoch permutation") {
    def run(epoch: Int) = Mix.epochOrder(docs, epoch, seed = 11L)
      .select(col("doc_id"), col("epoch_pos")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val e1 = run(1)
    assert(e1.values.toSeq.sorted == (0L until 200L),
      "positions must be a permutation of 0..n-1")
    assert(run(1) == e1, "same epoch must reproduce the same order")
    val e2 = run(2)
    assert(e2.values.toSeq.sorted == (0L until 200L))
    assert(e1 != e2, "different epochs must shuffle differently")
    // schema: every input column survives plus epoch_pos, no temp cols
    val cols = Mix.epochOrder(docs, 1, seed = 11L).columns.toSeq
    assert(cols == Seq("doc_id", "source", "text", "epoch_pos"))
  }
}
