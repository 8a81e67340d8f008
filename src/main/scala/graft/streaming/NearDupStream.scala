package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.graftbridge.DatasetBridge
import graft.data.Dedup
import graft.linkage.expr.{functions => gf}

/** Streaming NEAR-dup dedup — the LSH leg of the streaming dedup family
  * (exact leg: TranscriptStream.dedupStream). A foreachBatch loop keeps
  * a persisted MinHash signature store; every micro-batch is deduped
  * against everything already admitted plus itself, and survivors'
  * signatures are appended.
  *
  * Streaming trade (documented, deliberate): duplicate detection uses
  * the SIGNATURE-estimated Jaccard (fraction of agreeing slots, ±1/√k ≈
  * 0.12 at k=64) rather than the batch path's exact shingle-set verify —
  * exact verification would need every stored document's shingles, i.e.
  * the corpus itself, inside the stream. Run Dedup.minHashNearDups over
  * the admitted corpus in batch when exact precision matters; the
  * streaming gate is the recall-oriented first pass.
  *
  * At scale: the store is (doc_id, sig) parquet — one 64-long array per
  * admitted doc; band buckets are derived on read with one transform.
  * Re-bucket the store table by band/bucket when it outgrows a broadcast.
  */
object NearDupStream {

  /** One micro-batch step (exactly what the foreachBatch sink invokes;
    * exposed for deterministic testing). Returns the batch's survivors
    * — docs that are near-dups neither of any stored doc nor of a
    * smaller-id doc in the same batch — and appends their signatures to
    * `storePath`. */
  def nearDupBatch(batch: DataFrame, storePath: String,
                   cfg: Dedup.MinHashConfig =
                     Dedup.MinHashConfig(oph = true),
                   idCol: String = "doc_id", textCol: String = "text")
      : DataFrame = {
    val spark = batch.sparkSession
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val exploded = Dedup.explodedShingles(batch, idCol, textCol,
      cfg.shingleSize)
    val sigs =
      (if (cfg.oph) Dedup.minHashSignaturesOPH(exploded, cfg, idCol)
       else Dedup.minHashSignatures(exploded, cfg, idCol)).persist(lvl)
    sigs.count()

    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(storePath), spark.sparkContext.hadoopConfiguration)
    val storeExists = fs.exists(new org.apache.hadoop.fs.Path(storePath))
    val storeSigs = if (storeExists) spark.read.parquet(storePath)
                    else spark.createDataFrame(
                      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
                      sigs.schema)

    val batchBuckets = Dedup.lshBuckets(sigs, cfg, idCol)
    val knownBuckets = Dedup.lshBuckets(storeSigs, cfg, idCol)
      .withColumn("stored", lit(true))
      .unionByName(batchBuckets.withColumn("stored", lit(false)))
    // candidate (batch doc, other doc) sharing a band bucket, where the
    // batch doc loses to any stored doc and to smaller batch ids
    val l = batchBuckets.select(col("band"), col("bucket"),
      col(idCol).as("cand_id"))
    val r = knownBuckets.select(col("band").as("band_r"),
      col("bucket").as("bucket_r"), col(idCol).as("other_id"),
      col("stored"))
    val cands = l.join(r, col("band") === col("band_r") &&
        col("bucket") === col("bucket_r") &&
        (col("stored") || col("other_id") < col("cand_id")))
      .select("cand_id", "other_id").distinct()

    // signature-estimated Jaccard = fraction of agreeing slots
    val allSigs = storeSigs.unionByName(sigs)
    val est = cands
      .join(sigs.select(col(idCol).as("cand_id"), col("sig").as("sig_a")),
        "cand_id")
      .join(allSigs.select(col(idCol).as("other_id"),
        col("sig").as("sig_b")), "other_id")
      // codegen'd slot-agreement kernel (expr.SigAgreement) — the
      // aggregate(zip_with(..)) HOF form ran interpreted per candidate
      .withColumn("est_jaccard",
        gf.sig_agreement(col("sig_a"), col("sig_b")).cast("double") /
          cfg.numHashes)
    val dropped = est.filter(col("est_jaccard") >= cfg.jaccardThreshold)
      .select(col("cand_id").as(idCol)).distinct()

    // survivors must stop depending on the store path BEFORE the append:
    // refreshByPath below invalidates every cache over that path, and a
    // lazy recompute after the append would find the batch's own
    // signatures in the store and drop the whole batch as
    // self-duplicates (measured: batch 2 returned empty). localCheckpoint
    // is eager and lineage-free, so the returned frame is inert.
    val survivors = batch.join(dropped, Seq(idCol), "left_anti")
      .localCheckpoint()
    sigs.join(survivors.select(idCol), Seq(idCol), "left_semi")
      .write.mode("append").parquet(storePath)
    spark.catalog.refreshByPath(storePath)
    sigs.unpersist(blocking = false)
    survivors
  }

  /** foreachBatch sink: admitted (near-dup-free) docs land in
    * `outPath`, signatures accumulate in `storePath`, progress is
    * checkpointed. `docs` is a streaming DataFrame with (doc_id, text). */
  def nearDupSink(docs: DataFrame, storePath: String, outPath: String,
                  checkpointDir: String,
                  cfg: Dedup.MinHashConfig = Dedup.MinHashConfig(oph = true))
      : StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val survivors = nearDupBatch(batch, storePath, cfg)
        survivors.write.mode("append").parquet(outPath)
        // survivors is localCheckpoint()'d — Dataset.unpersist() only
        // talks to the CacheManager and never frees checkpoint blocks,
        // so a long-running stream would accumulate one checkpointed
        // batch per trigger (the leak class measured to degrade CC
        // 4 s → 55 s). Release the backing RDD explicitly.
        DatasetBridge.releaseCheckpoint(survivors)
        ()
      }
      .start()

  /** Batch reconcile job closing the stream's documented estimated-vs-
    * exact gap: re-runs the EXACT shingle-set Jaccard over the corpus the
    * stream processed and diffs it against the store's admit/drop
    * decisions. Emits one row per disagreement:
    *
    *  - `false_admit`: both docs were admitted, but their exact Jaccard
    *    ≥ threshold — a duplicate the estimate let through (id_a, id_b,
    *    exact jaccard);
    *  - `false_drop`: a dropped doc whose exact Jaccard vs EVERY admitted
    *    doc is < threshold — the estimate over-fired (id_a = dropped doc,
    *    id_b = its closest admitted doc or null, jaccard = that best
    *    exact value or 0).
    *
    * `corpus` is the full (id, text) set that passed through the stream
    * (admitted docs live in outPath, but reconcile needs dropped texts
    * too — the ingest source itself). Drop decisions are judged against
    * the ADMITTED set only: a doc dropped transitively against another
    * doc that was itself dropped in the same batch can flag as
    * false_drop — by construction such chains only occur when the
    * estimate fired twice, so the flag is the right signal to re-ingest.
    *
    * The result is localCheckpoint()'d (interior fan-out caches are
    * released before returning); free it with
    * DatasetBridge.releaseCheckpoint when done. */
  def reconcileStore(storePath: String, corpus: DataFrame,
                     cfg: Dedup.MinHashConfig =
                       Dedup.MinHashConfig(oph = true),
                     idCol: String = "doc_id", textCol: String = "text")
      : DataFrame = {
    val spark = corpus.sparkSession
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // both fan out to several joins inside the one materializing action:
    // without the persists the store scan + distinct re-runs four times
    // and the corpus scan three (the measured minhash-fan-out lesson)
    val admittedIds = spark.read.parquet(storePath)
      .select(col(idCol)).distinct().persist(lvl)
    val corpusP = corpus.persist(lvl)
    val admitted = corpusP.join(admittedIds, Seq(idCol), "left_semi")
    val dropped = corpusP.join(admittedIds, Seq(idCol), "left_anti")

    // exact near-dup pairs among admitted docs = duplicates that got in
    val admitPairs = Dedup.minHashNearDups(admitted, cfg, idCol, textCol)
    val falseAdmits = admitPairs
      .select(col("id_a"), col("id_b"), col("jaccard"),
        lit("false_admit").as("kind"))

    // dropped docs vs admitted: LSH candidates + exact verify, then keep
    // docs whose best exact Jaccard never reaches the threshold
    val exploded = Dedup.explodedShingles(corpusP, idCol, textCol,
      cfg.shingleSize).persist(lvl)
    val sigs = if (cfg.oph) Dedup.minHashSignaturesOPH(exploded, cfg, idCol)
               else Dedup.minHashSignatures(exploded, cfg, idCol)
    val buckets = Dedup.lshBuckets(sigs, cfg, idCol).persist(lvl)
    val dB = buckets.join(admittedIds, Seq(idCol), "left_anti")
      .select(col("band"), col("bucket"), col(idCol).as("id_a"))
    val aB = buckets.join(admittedIds, Seq(idCol), "left_semi")
      .select(col("band").as("band_r"), col("bucket").as("bucket_r"),
        col(idCol).as("id_b"))
    val cands = dB.join(aB, col("band") === col("band_r") &&
        col("bucket") === col("bucket_r"))
      .select("id_a", "id_b").distinct()
    val best = Dedup.jaccardVerify(exploded, cands, idCol)
      .groupBy(col("id_a"))
      .agg(max(struct(col("jaccard"), col("id_b"))).as("b"))
      .select(col("id_a"), col("b.id_b").as("id_b"),
        col("b.jaccard").as("jaccard"))
    val falseDrops = dropped.select(col(idCol).as("id_a"))
      .join(best, Seq("id_a"), "left")
      .filter(col("jaccard").isNull ||
        col("jaccard") < cfg.jaccardThreshold)
      .select(col("id_a"), col("id_b"),
        coalesce(col("jaccard"), lit(0.0)).as("jaccard"),
        lit("false_drop").as("kind"))

    val out = falseAdmits.unionByName(falseDrops).localCheckpoint()
    admitPairs.unpersist(blocking = false)
    exploded.unpersist(blocking = false)
    buckets.unpersist(blocking = false)
    admittedIds.unpersist(blocking = false)
    corpusP.unpersist(blocking = false)
    out
  }
}

/** Batch reconcile CLI over a streaming near-dup signature store:
  *
  *   spark-submit --class graft.streaming.ReconcileMain <jar> \
  *     --store <signature store parquet> --corpus <docs parquet> \
  *     --output <dir> [--jaccard 0.7] [--num-hashes 64] [--bands 16]
  *     [--shingle-size 3] [--seed 42] [--no-oph]
  *
  * Runs [[NearDupStream.reconcileStore]] (exact-Jaccard verify of the
  * stream's estimated admit/drop decisions), writes `<output>/diffs`
  * (id_a, id_b, jaccard, kind) and prints the false-admit / false-drop
  * counts. The minhash config MUST match the one the stream ran with —
  * every MinHashConfig knob is exposed so a non-default stream can be
  * reconciled (mismatched bands/shingles would silently compute the
  * wrong candidate set and Jaccard domain). */
object ReconcileMain {
  import graft.linkage.Cli

  def main(args: Array[String]): Unit = {
    val spark = Cli.session("graft-reconcile")
    try run(spark, Cli.parse(args, flags = Set("no-oph")))
    finally spark.stop()
  }

  def run(spark: SparkSession, opts: Map[String, String]): (Long, Long) = {
    val out = Cli.required(opts, "output")
    val cfg = Dedup.MinHashConfig(
      numHashes = opts.getOrElse("num-hashes", "64").toInt,
      bands = opts.getOrElse("bands", "16").toInt,
      shingleSize = opts.getOrElse("shingle-size", "3").toInt,
      jaccardThreshold = opts.getOrElse("jaccard", "0.7").toDouble,
      seed = opts.getOrElse("seed", "42").toLong,
      oph = !opts.contains("no-oph"))
    val corpus = spark.read.parquet(Cli.required(opts, "corpus"))
    val diffs = NearDupStream.reconcileStore(
      Cli.required(opts, "store"), corpus, cfg)
    diffs.write.mode("overwrite").parquet(s"$out/diffs")
    val counts = diffs.groupBy("kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    DatasetBridge.releaseCheckpoint(diffs)
    val fa = counts.getOrElse("false_admit", 0L)
    val fd = counts.getOrElse("false_drop", 0L)
    println(s"[graft] reconcile: false_admits=$fa false_drops=$fd")
    (fa, fd)
  }
}
