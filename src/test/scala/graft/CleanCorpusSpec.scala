package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.data.{CleanCorpus, CleanCorpusMain, Dedup}

/** Corpus-cleaning composition: exact dups collapse to the min id,
  * near-dups drop the larger id, junk and off-language docs filtered,
  * per-stage counts accurate, and the CLI main writes the artifacts. */
class CleanCorpusSpec extends AnyFunSuite with SparkFixture {

  private val en = "the quick brown fox jumps over the lazy dog and then " +
    "the small cat walks into the old house where the people are"
  private val en2 = "a different story is told here with many common words " +
    "that should be kept because the quality of this text is just fine"

  private lazy val corpus = {
    import spark.implicits._
    Seq(
      (0L, en),                                   // keeper
      (1L, en),                                   // exact dup of 0
      (2L, en2),                                  // keeper
      (3L, en2.replace("different", "changed")),  // near-dup of 2
      (4L, "x"),                                  // junk: too short
      (5L, "der schnelle braune fuchs springt und dann geht die kleine " +
        "katze in das alte haus wo die leute sind und bleiben dort lange"),
      (6L, "the weather today is quite nice and many people are walking " +
        "outside in the park near the river with their happy children")
    ).toDF("doc_id", "text")
  }

  test("clean(): stagewise survivors and deterministic keep policy") {
    spark.catalog.clearCache() // isolate the strand-check from prior suites
    val (cleaned, counts) = CleanCorpus.clean(corpus,
      CleanCorpus.Config(
        lang = Some("en"), minQuality = 0.5,
        minhash = Dedup.MinHashConfig(jaccardThreshold = 0.6, bands = 32)))
    val ids = cleaned.select("doc_id").collect().map(_.getLong(0)).toSet
    // 1 drops as exact dup, 3 as near-dup, 4 as junk, 5 as German
    assert(ids == Set(0L, 2L, 6L), s"survivors: $ids")
    assert(counts.input == 7)
    assert(counts.afterExact == 6)     // -1 (exact dup)
    assert(counts.afterNearDup == 5)   // -3 (near dup)
    assert(counts.afterQuality == 4)   // -4 (junk)
    assert(counts.afterLang == 3)      // -5 (German)
    // quality features ride along on the survivors
    assert(cleaned.columns.contains("quality_score"))
    cleaned.unpersist()
    // interior caches released
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "clean() must not strand cached blocks")
  }

  test("CleanCorpusMain writes cleaned parquet + stats.json") {
    val dir = java.nio.file.Files.createTempDirectory("cleancorpus").toString
    corpus.write.mode("overwrite").parquet(s"$dir/in")
    val counts = CleanCorpusMain.run(spark, Map(
      "input" -> s"$dir/in", "output" -> s"$dir/out",
      "neardup-jaccard" -> "0.6"))
    assert(counts.afterLang == 3)
    val written = spark.read.parquet(s"$dir/out/cleaned")
    assert(written.count() == 3)
    val stats = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$dir/out/stats.json"))
    assert(stats.contains("\"input\":7"))
    assert(stats.contains("\"after_lang\":3"))
  }
}
