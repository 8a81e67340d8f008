package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.data.Dedup

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
      .withColumn("est_jaccard",
        aggregate(zip_with(col("sig_a"), col("sig_b"),
          (a, b) => when(a === b, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / cfg.numHashes)
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
        survivors.unpersist(blocking = false)
        ()
      }
      .start()
}
