package graft.data

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-corpus cleaning pipeline — the composition the individual
  * data ops exist for: exact dedup → MinHash near-dup dedup → quality
  * filter → language filter, with per-stage survivor counts. Each stage
  * is the library operator (Dedup / TextAnalysis), so every plan-shape
  * property those carry (join-back exact dedup, banded LSH + exact
  * verify, codegen'd quality/lang projections) holds for the composed
  * run. Survivor policy is deterministic: exact groups keep the minimum
  * id; near-dup pairs drop the LARGER id of every qualifying pair (so a
  * chain a~b~c keeps only a).
  */
object CleanCorpus {

  case class Config(
      lang: Option[String] = Some("en"),
      minQuality: Double = 0.5,
      minhash: Dedup.MinHashConfig =
        Dedup.MinHashConfig(jaccardThreshold = 0.8, oph = true))

  case class StageCounts(input: Long, afterExact: Long, afterNearDup: Long,
                         afterQuality: Long, afterLang: Long) {
    def toJson: String =
      s"""{"input":$input,"after_exact_dedup":$afterExact,""" +
      s""""after_neardup":$afterNearDup,"after_quality":$afterQuality,""" +
      s""""after_lang":$afterLang}"""
  }

  /** Returns (cleaned docs with quality columns attached, stage counts).
    * The returned DataFrame is persisted (single caller-owned handle);
    * unpersist when done. Interior fan-out caches are released here. */
  def clean(docs: DataFrame, cfg: Config = Config(),
            idCol: String = "doc_id", textCol: String = "text")
      : (DataFrame, StageCounts) = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val nIn = docs.count()

    // 1. exact dedup: keep each group's min-id representative
    val keepers = Dedup.exact(docs, idCol, textCol)
      .filter(col(idCol) === col("keeper")).select(idCol)
    val exact = docs.join(keepers, Seq(idCol), "left_semi").persist(lvl)
    val nExact = exact.count()

    // 2. near-dup dedup: drop the larger id of every verified pair
    val pairs = Dedup.minHashNearDups(exact, cfg.minhash, idCol, textCol)
    val drops = pairs.select(col("id_b").as(idCol)).distinct()
    val nearDeduped = exact.join(drops, Seq(idCol), "left_anti").persist(lvl)
    val nNear = nearDeduped.count()
    pairs.unpersist(blocking = false)
    exact.unpersist(blocking = false)

    // 3. quality floor (codegen'd feature projection, no shuffle)
    val scored = TextAnalysis.qualityFeatures(nearDeduped, textCol)
      .filter(col("quality_score") >= cfg.minQuality)
    // 4. language pin — langGuessDf's explode + conditional-sum plan
    //    (codegen), NOT the per-row langGuess Column whose HOF lambdas
    //    run interpreted (measured 3.4 s vs 0.6 s at sf0.1); in the
    //    composed full-corpus pipeline this is the hot path
    val cleaned = cfg.lang
      .map(l => TextAnalysis.langGuessDf(scored, idCol, textCol)
        .filter(col("lang_guess") === l).drop("lang_guess"))
      .getOrElse(scored)
      .persist(lvl)
    val nLang = cleaned.count()
    val nQuality = cfg.lang.map(_ => scored.count()).getOrElse(nLang)
    nearDeduped.unpersist(blocking = false)

    (cleaned, StageCounts(nIn, nExact, nNear, nQuality, nLang))
  }
}

/** CLI driver:
  *
  *   spark-submit --class graft.data.CleanCorpusMain <jar> \
  *     --input <documents parquet> --output <dir> \
  *     [--min-quality 0.5] [--lang en|none] [--neardup-jaccard 0.8]
  *     [--no-oph]
  *
  * Writes `<output>/cleaned` (parquet, original columns + quality
  * features) and `<output>/stats.json` (per-stage survivor counts).
  */
object CleanCorpusMain {
  import graft.linkage.Cli

  def main(args: Array[String]): Unit = {
    val spark = Cli.session("graft-clean-corpus")
    run(spark, Cli.parse(args, flags = Set("no-oph")))
    spark.stop()
  }

  def run(spark: SparkSession,
          opts: Map[String, String]): CleanCorpus.StageCounts = {
    val out = Cli.required(opts, "output")
    val docs = spark.read.parquet(Cli.required(opts, "input"))
    val lang = opts.getOrElse("lang", "en") match {
      case "none" => None
      case l => Some(l)
    }
    val cfg = CleanCorpus.Config(
      lang = lang,
      minQuality = opts.getOrElse("min-quality", "0.5").toDouble,
      minhash = Dedup.MinHashConfig(
        jaccardThreshold = opts.getOrElse("neardup-jaccard", "0.8").toDouble,
        oph = !opts.contains("no-oph")))
    val (cleaned, counts) = CleanCorpus.clean(docs, cfg)
    cleaned.write.mode("overwrite").parquet(s"$out/cleaned")
    cleaned.unpersist(blocking = false)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(out), spark.sparkContext.hadoopConfiguration)
    val o = fs.create(new org.apache.hadoop.fs.Path(s"$out/stats.json"), true)
    o.write(counts.toJson.getBytes("UTF-8"))
    o.close()
    println(s"[graft] clean-corpus: ${counts.toJson}")
    counts
  }
}
