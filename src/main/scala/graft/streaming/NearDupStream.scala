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
  * Store layout (v2 — the at-scale shape, VERDICT r04 #1):
  *
  *   storePath/sigs/band=<b>/shard=<s>/…parquet   (bucket, doc_id, sig)
  *   storePath/_store_meta.json                   layout + minhash config
  *
  * One row PER BAND per admitted doc, PARTITIONED BY (band, shard) with
  * shard = bucket mod `shards` — the writeIvfIndex cells pattern. A
  * micro-batch collects its own (band, shard) set (bounded by
  * bands×shards regardless of batch size) and reads ONLY those store
  * partitions; nothing ever scans or re-buckets the whole store
  * (the v1 layout re-derived every band bucket of every stored doc on
  * every trigger — O(store) compute + IO per batch). The price is the
  * signature duplicated ×bands in store rows (write amplification);
  * the win is per-trigger IO that scales with the BATCH's bucket
  * footprint, not the corpus. Size `shards` so bands×shards comfortably
  * exceeds a typical batch's distinct-bucket count — partitions a batch
  * does not touch are never opened.
  *
  * Delivery semantics: survivors append to the caller's out path
  * at-least-once (foreachBatch replays after a crash). The store append
  * itself is replay-safe for RESULTS — a replayed batch anti-joins its
  * own earlier rows out of the pruned store view (see nearDupBatch), so
  * it recomputes identical survivors; the duplicate signature rows a
  * replay appends are content-identical and candidates dedup on
  * (cand, other), so decisions never change. Dedup the out path
  * downstream when exactly-once matters (or front it with the
  * committed-pointer pattern LinkageStream uses).
  */
object NearDupStream {

  /** Bumped when the store layout or bucket derivation changes. */
  val StoreVersion = 2

  /** Store partition fan-out: partitions = bands × shards. */
  val DefaultShards = 16

  case class StoreMeta(version: Int, numHashes: Int, bands: Int,
                       shingleSize: Int, seed: Long, oph: Boolean,
                       shards: Int)

  private def hadoopFs(spark: SparkSession, path: String) =
    org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)

  private[graft] def readStoreMeta(spark: SparkSession,
                                       storePath: String): Option[StoreMeta] = {
    val fs = hadoopFs(spark, storePath)
    val metaPath =
      new org.apache.hadoop.fs.Path(s"$storePath/_store_meta.json")
    if (!fs.exists(metaPath)) {
      // a store dir with data but no meta is a pre-v2 (flat) layout:
      // its flat (doc_id, sig) rows carry no band partitions, so reading
      // it as v2 would silently see an empty store and re-admit dups
      require(!fs.exists(new org.apache.hadoop.fs.Path(storePath)) ||
        fs.listStatus(new org.apache.hadoop.fs.Path(storePath)).isEmpty,
        s"$storePath exists without _store_meta.json — a v1 flat " +
          "signature store; run NearDupStream.migrateStore once (or point " +
          "the stream at a fresh store dir)")
      None
    } else {
      val in = fs.open(metaPath)
      val txt = scala.io.Source.fromInputStream(in).mkString
      in.close()
      val n = new com.fasterxml.jackson.databind.ObjectMapper().readTree(txt)
      require(Seq("version", "numHashes", "bands", "shingleSize", "seed",
        "oph", "shards").forall(n.has),
        s"corrupt store meta $metaPath: '$txt'")
      val meta = StoreMeta(n.get("version").asInt, n.get("numHashes").asInt,
        n.get("bands").asInt, n.get("shingleSize").asInt,
        n.get("seed").asLong, n.get("oph").asBoolean, n.get("shards").asInt)
      require(meta.version == StoreVersion,
        s"store $storePath is layout v${meta.version}, engine supports " +
          s"v$StoreVersion")
      Some(meta)
    }
  }

  private def writeStoreMeta(spark: SparkSession, storePath: String,
                             meta: StoreMeta): Unit = {
    val fs = hadoopFs(spark, storePath)
    val out = fs.create(
      new org.apache.hadoop.fs.Path(s"$storePath/_store_meta.json"), true)
    out.write((s"""{"version":${meta.version},"numHashes":${meta.numHashes},""" +
      s""""bands":${meta.bands},"shingleSize":${meta.shingleSize},""" +
      s""""seed":${meta.seed},"oph":${meta.oph},"shards":${meta.shards}}""")
      .getBytes("UTF-8"))
    out.close()
  }

  /** A config mismatch against the store silently computes foreign
    * buckets/signatures and re-admits every duplicate — refuse loudly. */
  private def requireCompatible(meta: StoreMeta,
                                cfg: Dedup.MinHashConfig): Unit =
    require(meta.numHashes == cfg.numHashes && meta.bands == cfg.bands &&
      meta.shingleSize == cfg.shingleSize && meta.seed == cfg.seed &&
      meta.oph == cfg.oph,
      s"minhash config mismatch vs store meta: store has " +
        s"(numHashes=${meta.numHashes}, bands=${meta.bands}, " +
        s"shingleSize=${meta.shingleSize}, seed=${meta.seed}, " +
        s"oph=${meta.oph}); caller passed (numHashes=${cfg.numHashes}, " +
        s"bands=${cfg.bands}, shingleSize=${cfg.shingleSize}, " +
        s"seed=${cfg.seed}, oph=${cfg.oph})")

  /** The store's on-disk schema for a given id type — supplied explicitly
    * on every read so schema inference never opens a parquet footer in an
    * unmatched partition (it also skips the per-batch inference pass). */
  private def storeSchema(idCol: String,
                          idType: org.apache.spark.sql.types.DataType) = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("bucket", LongType),
      StructField(idCol, idType),
      StructField("sig", ArrayType(LongType)),
      StructField("band", IntegerType),
      StructField("shard", IntegerType)))
  }

  /** Pruned store view for a batch's (band, shard) footprint. The filter
    * is a disjunction over PARTITION columns only — bounded by
    * bands×shards terms — so the scan lists and reads matched partition
    * directories exclusively (NearDupStreamSpec proves it by planting a
    * poison file in an untouched partition). */
  private[graft] def prunedStore(spark: SparkSession, storePath: String,
                                     idCol: String,
                                     idType: org.apache.spark.sql.types.DataType,
                                     touched: Seq[(Int, Int)]): DataFrame = {
    // meta is written BEFORE the first sigs append (crash-ordering
    // contract) — a replay between the two reads an empty store, so a
    // missing sigs dir must mean "no rows", not path-not-found (ADVICE
    // r05: the stream failed on every replay of that window otherwise)
    if (!sigsDirExists(spark, storePath))
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        storeSchema(idCol, idType))
    val base = spark.read.schema(storeSchema(idCol, idType))
      .parquet(s"$storePath/sigs")
    // balanced OR tree: a left-deep reduce at bands×shards terms (512 at
    // bands=32) overflows the Column→Expression converter's recursion
    def orAll(cs: Seq[org.apache.spark.sql.Column]): org.apache.spark.sql.Column =
      if (cs.length == 1) cs.head
      else {
        val (a, b) = cs.splitAt(cs.length / 2)
        orAll(a) || orAll(b)
      }
    if (touched.isEmpty) base.filter(lit(false))
    else base.filter(orAll(touched.map { case (b, s) =>
      col("band") === b && col("shard") === s
    }))
  }

  /** All admitted doc ids (deduped): reconcile/audit entry point. */
  private[streaming] def storedIds(spark: SparkSession, storePath: String,
                                   idCol: String,
                                   idType: org.apache.spark.sql.types.DataType =
                                     org.apache.spark.sql.types.LongType)
      : DataFrame = {
    val meta = readStoreMeta(spark, storePath)
    require(meta.isDefined, s"no signature store at $storePath")
    // same meta-before-first-append tolerance as [[prunedStore]]
    if (!sigsDirExists(spark, storePath))
      spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField(idCol, idType))))
        .select(col(idCol))
    else spark.read.parquet(s"$storePath/sigs").select(col(idCol))
  }

  private def sigsDirExists(spark: SparkSession, storePath: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$storePath/sigs")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** One-time v1 → v2 store migration: flat (doc_id, sig) rows become
    * per-band bucket rows partitioned by (band, shard). */
  def migrateStore(spark: SparkSession, v1Path: String, v2Path: String,
                   cfg: Dedup.MinHashConfig = Dedup.MinHashConfig(oph = true),
                   idCol: String = "doc_id",
                   shards: Int = DefaultShards): Unit = {
    val old = spark.read.parquet(v1Path)
    writeStoreMeta(spark, v2Path, StoreMeta(StoreVersion, cfg.numHashes,
      cfg.bands, cfg.shingleSize, cfg.seed, cfg.oph, shards))
    clusterForWrite(bucketRows(old, cfg, idCol, shards))
      .write.mode("append").partitionBy("band", "shard")
      .parquet(s"$v2Path/sigs")
  }

  /** Bootstrap a v2 store holding EVERY doc's signature — the handle
    * batch incremental dedup (IncrementalDedup) buckets new docs
    * against. Contrast [[nearDupBatch]], which stores admitted
    * (near-dup-free) docs only: an incremental-dedup store must cover
    * the whole previous corpus, duplicates included, because the
    * full-recompute it must match generates candidates over all docs. */
  def buildStore(docs: DataFrame, storePath: String,
                 cfg: Dedup.MinHashConfig = Dedup.MinHashConfig(),
                 idCol: String = "doc_id", textCol: String = "text",
                 shards: Int = DefaultShards): Unit = {
    val spark = docs.sparkSession
    require(readStoreMeta(spark, storePath).isEmpty,
      s"store already exists at $storePath")
    val sigs = {
      val exploded = Dedup.explodedShingles(docs, idCol, textCol,
        cfg.shingleSize)
      if (cfg.oph) Dedup.minHashSignaturesOPH(exploded, cfg, idCol)
      else Dedup.minHashSignatures(exploded, cfg, idCol)
    }
    writeStoreMeta(spark, storePath, StoreMeta(StoreVersion, cfg.numHashes,
      cfg.bands, cfg.shingleSize, cfg.seed, cfg.oph, shards))
    clusterForWrite(bucketRows(sigs, cfg, idCol, shards))
      .write.mode("append").partitionBy("band", "shard")
      .parquet(s"$storePath/sigs")
  }

  /** (band, shard, bucket, id, sig) store rows from a signature relation. */
  private def bucketRows(sigs: DataFrame, cfg: Dedup.MinHashConfig,
                         idCol: String, shards: Int): DataFrame =
    Dedup.lshBuckets(sigs, cfg, idCol)
      .withColumn("shard", pmod(col("bucket"), lit(shards.toLong)).cast("int"))
      .join(sigs.select(col(idCol), col("sig")), Seq(idCol))
      .select(col("band"), col("shard"), col("bucket"), col(idCol),
        col("sig"))

  /** Cluster append rows by their target partition before the
    * partitionBy write: without this every writer task emits one file
    * per (band, shard) value it holds — measured ~10k files PER BATCH at
    * bands×shards = 256 and 32 shuffle partitions (the small-files
    * pathology that dominates trigger wall as the store ages). With it,
    * each (band, shard) lands in exactly one task → at most one file per
    * touched partition per append. */
  private def clusterForWrite(rows: DataFrame): DataFrame =
    rows.repartition(col("band"), col("shard"))

  /** Per-partition file compaction for the (band, shard) store — run on
    * a schedule for long-lived streams: every append adds at most one
    * file per touched partition, so after B batches a hot partition
    * holds up to B small files and the per-trigger pruned-scan cost
    * creeps with file count, not data size. Rewrites only partitions
    * over `maxFilesPerPartition` (dynamic partition overwrite; rows are
    * localCheckpoint()'d first — the self-overwrite rule). Returns the
    * number of partitions rewritten. */
  def compactStore(spark: SparkSession, storePath: String,
                   maxFilesPerPartition: Int = 8): Int = {
    val meta = readStoreMeta(spark, storePath)
    require(meta.isDefined, s"no signature store at $storePath")
    val fs = hadoopFs(spark, storePath)
    val sigsPath = new org.apache.hadoop.fs.Path(s"$storePath/sigs")
    val over = for {
      bandDir <- fs.listStatus(sigsPath).toSeq
      if bandDir.isDirectory && bandDir.getPath.getName.startsWith("band=")
      shardDir <- fs.listStatus(bandDir.getPath).toSeq
      if shardDir.isDirectory && shardDir.getPath.getName.startsWith("shard=")
      if fs.listStatus(shardDir.getPath).count(f =>
        f.isFile && f.getPath.getName.endsWith(".parquet")) >
        maxFilesPerPartition
    } yield (bandDir.getPath.getName.stripPrefix("band=").toInt,
      shardDir.getPath.getName.stripPrefix("shard=").toInt)
    if (over.isEmpty) return 0
    def orAll(cs: Seq[org.apache.spark.sql.Column]): org.apache.spark.sql.Column =
      if (cs.length == 1) cs.head
      else { val (a, b) = cs.splitAt(cs.length / 2); orAll(a) || orAll(b) }
    val rows = spark.read.parquet(s"$storePath/sigs")
      .filter(orAll(over.map { case (b, s) =>
        col("band") === b && col("shard") === s }))
      .repartition(col("band"), col("shard"))
      .localCheckpoint()
    val prevMode = spark.conf.get(
      "spark.sql.sources.partitionOverwriteMode", "static")
    try {
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      rows.write.mode("overwrite").partitionBy("band", "shard")
        .parquet(s"$storePath/sigs")
    } finally
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", prevMode)
    DatasetBridge.releaseCheckpoint(rows)
    spark.catalog.refreshByPath(s"$storePath/sigs")
    over.length
  }

  /** One micro-batch step (exactly what the foreachBatch sink invokes;
    * exposed for deterministic testing). Returns the batch's survivors
    * — docs that are near-dups neither of any stored doc nor of a
    * smaller-id doc in the same batch — and appends their signatures'
    * bucket rows to `storePath`. Only store partitions matching the
    * batch's own (band, shard) footprint are read. */
  def nearDupBatch(batch: DataFrame, storePath: String,
                   cfg: Dedup.MinHashConfig =
                     Dedup.MinHashConfig(oph = true),
                   idCol: String = "doc_id", textCol: String = "text",
                   shards: Int = DefaultShards): DataFrame = {
    val spark = batch.sparkSession
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val exploded = Dedup.explodedShingles(batch, idCol, textCol,
      cfg.shingleSize)
    val sigs =
      (if (cfg.oph) Dedup.minHashSignaturesOPH(exploded, cfg, idCol)
       else Dedup.minHashSignatures(exploded, cfg, idCol)).persist(lvl)
    sigs.count()
    val idType = batch.schema(idCol).dataType

    val meta = readStoreMeta(spark, storePath)
    meta.foreach(requireCompatible(_, cfg))
    val shardsEff = meta.map(_.shards).getOrElse(shards)

    val batchBuckets = Dedup.lshBuckets(sigs, cfg, idCol)
      .withColumn("shard",
        pmod(col("bucket"), lit(shardsEff.toLong)).cast("int"))
      .persist(lvl)
    // the batch's partition footprint — bounded by bands×shards values
    // however large the batch, so the driver collect stays tiny
    val touched = batchBuckets.select(col("band"), col("shard")).distinct()
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq

    // pruned store rows relevant to this batch, minus the batch's own
    // ids: a crash between the store append and the checkpoint commit
    // re-delivers the batch, and without the anti-join its own earlier
    // rows would mark every doc a self-duplicate (survivors == empty,
    // the batch silently lost from the out path). The anti-join restores
    // the pre-append view, so a replay recomputes identical survivors.
    val storeRows = meta match {
      case None => None
      case Some(_) =>
        Some(prunedStore(spark, storePath, idCol, idType, touched)
          .join(batch.select(col(idCol)), Seq(idCol), "left_anti")
          .persist(lvl))
    }

    // candidates: batch × pruned store (any stored doc beats a batch
    // doc) plus batch-internal smaller-id pairs — thin (cand, other)
    // rows only; signatures re-attach after the distinct so no sig
    // array crosses the dedup exchange
    val l = batchBuckets.select(col("band"), col("shard"), col("bucket"),
      col(idCol).as("cand_id"))
    val storedCands = storeRows.map { sr =>
      l.join(sr.select(col("band"), col("shard"), col("bucket"),
          col(idCol).as("other_id")),
        Seq("band", "shard", "bucket"))
        .select("cand_id", "other_id")
    }
    val batchCands = l.join(
        batchBuckets.select(col("band").as("band_r"),
          col("shard").as("shard_r"), col("bucket").as("bucket_r"),
          col(idCol).as("other_id")),
        col("band") === col("band_r") && col("shard") === col("shard_r") &&
          col("bucket") === col("bucket_r") &&
          col("other_id") < col("cand_id"))
      .select("cand_id", "other_id")
    val cands = storedCands.map(_.unionByName(batchCands))
      .getOrElse(batchCands).distinct()

    // signature-estimated Jaccard = fraction of agreeing slots; the
    // other side's sig comes from the PRUNED store subset (small,
    // persisted) or the batch's own signatures — never a store scan
    val otherSigs = storeRows
      .map(_.select(col(idCol).as("other_id"), col("sig").as("sig_b"))
        .dropDuplicates("other_id"))
      .map(_.unionByName(
        sigs.select(col(idCol).as("other_id"), col("sig").as("sig_b"))))
      .getOrElse(
        sigs.select(col(idCol).as("other_id"), col("sig").as("sig_b")))
    val est = cands
      .join(sigs.select(col(idCol).as("cand_id"), col("sig").as("sig_a")),
        "cand_id")
      .join(otherSigs, "other_id")
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
    // meta BEFORE the first data append: a crash between them leaves a
    // valid empty store, whereas data-without-meta would read as a v1
    // layout and refuse to start
    if (meta.isEmpty)
      writeStoreMeta(spark, storePath, StoreMeta(StoreVersion,
        cfg.numHashes, cfg.bands, cfg.shingleSize, cfg.seed, cfg.oph,
        shardsEff))
    clusterForWrite(batchBuckets
        .join(survivors.select(idCol), Seq(idCol), "left_semi")
        .join(sigs.select(col(idCol), col("sig")), Seq(idCol))
        .select(col("band"), col("shard"), col("bucket"), col(idCol),
          col("sig")))
      .write.mode("append").partitionBy("band", "shard")
      .parquet(s"$storePath/sigs")
    spark.catalog.refreshByPath(s"$storePath/sigs")
    sigs.unpersist(blocking = false)
    batchBuckets.unpersist(blocking = false)
    storeRows.foreach(_.unpersist(blocking = false))
    survivors
  }

  /** foreachBatch sink: admitted (near-dup-free) docs land in
    * `outPath`, signatures accumulate in `storePath`, progress is
    * checkpointed. `docs` is a streaming DataFrame with (doc_id, text).
    * `once = true` drains everything currently available and stops
    * (Trigger.AvailableNow — the scheduled-job deployment shape). */
  def nearDupSink(docs: DataFrame, storePath: String, outPath: String,
                  checkpointDir: String,
                  cfg: Dedup.MinHashConfig = Dedup.MinHashConfig(oph = true),
                  once: Boolean = false)
      : StreamingQuery = {
    val writer = docs.writeStream
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
    (if (once)
       writer.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
     else writer)
      .start()
  }

  /** Batch reconcile job closing the stream's documented estimated-vs-
    * exact gap: re-runs the EXACT shingle-set Jaccard over the corpus the
    * stream processed and diffs it against the store's admit/drop
    * decisions.
    *
    * Candidate generation here is DECOUPLED from the stream's banding
    * (ADVICE r04): reconcile re-buckets at MAX-RECALL banding
    * (bands = numHashes, r = 1 — any shared signature slot makes a
    * candidate), not the stream's coarser bands. With the stream's own
    * bands a pair the stream's banding never collided on would produce
    * identical buckets here and be missed identically — the banding-miss
    * false_admit class would be structurally undetectable. At r = 1 the
    * residual miss probability for a pair with exact Jaccard s is
    * (1-s)^numHashes (slot agreement ≈ s per slot): ≤ 1e-33 at the 0.7
    * default threshold with k = 64. The price is candidate volume — slot
    * collisions scale with pairwise similarity, so a mutually-similar
    * corpus approaches all-pairs verification. That is the audit's cost
    * model by design: run it per-partition/per-sample at corpus scale.
    * The oversized-bucket cap is intentionally OFF here for the same
    * reason (a capped audit silently under-reports).
    *
    * Emits one row per disagreement:
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
    // max-recall banding for the audit (see scaladoc): signatures are
    // bands-independent, so only the BUCKETING legs change granularity;
    // the hot-bucket cap is OFF — a capped audit under-reports silently
    val auditCfg = cfg.copy(bands = cfg.numHashes, capRatio = 1.0)
    // both fan out to several joins inside the one materializing action:
    // without the persists the store scan + distinct re-runs four times
    // and the corpus scan three (the measured minhash-fan-out lesson)
    val admittedIds = storedIds(spark, storePath, idCol,
        corpus.schema(idCol).dataType)
      .distinct().persist(lvl)
    val corpusP = corpus.persist(lvl)
    val admitted = corpusP.join(admittedIds, Seq(idCol), "left_semi")
    val dropped = corpusP.join(admittedIds, Seq(idCol), "left_anti")

    // exact near-dup pairs among admitted docs = duplicates that got in
    val admitPairs = Dedup.minHashNearDups(admitted, auditCfg, idCol, textCol)
    val falseAdmits = admitPairs
      .select(col("id_a"), col("id_b"), col("jaccard"),
        lit("false_admit").as("kind"))

    // dropped docs vs admitted: LSH candidates + exact verify, then keep
    // docs whose best exact Jaccard never reaches the threshold
    val exploded = Dedup.explodedShingles(corpusP, idCol, textCol,
      cfg.shingleSize).persist(lvl)
    val sigs = if (cfg.oph) Dedup.minHashSignaturesOPH(exploded, cfg, idCol)
               else Dedup.minHashSignatures(exploded, cfg, idCol)
    val buckets = Dedup.lshBuckets(sigs, auditCfg, idCol).persist(lvl)
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

/** Streaming near-dup gate CLI — the deployment shape of
  * [[NearDupStream.nearDupSink]] (the near-dup twin of
  * LinkageStreamMain):
  *
  *   spark-submit --class graft.streaming.NearDupStreamMain <jar> \
  *     --source <landing dir of (doc_id, text) parquet> \
  *     --store <signature store dir> --output <admitted-docs dir> \
  *     --checkpoint <dir> [--once] [--compact <maxFilesPerPartition>]
  *     [--jaccard 0.7] [--num-hashes 64] [--bands 16]
  *     [--shingle-size 3] [--seed 42] [--no-oph] [--shards 16]
  *
  * The file source picks up parquet files of documents as they land
  * under --source. `--once` drains everything currently available and
  * exits (Trigger.AvailableNow) — each cron/Airflow invocation dedups
  * the files that arrived since the previous one, resuming from the
  * same checkpoint. `--compact N` runs
  * [[NearDupStream.compactStore]] after the stream stops (pair it with
  * --once; a long-lived stream should schedule compaction separately).
  * The minhash knobs MUST match the store's meta on an existing store
  * (mismatches are refused loudly). */
object NearDupStreamMain {
  import graft.linkage.Cli

  def main(args: Array[String]): Unit = {
    val opts = Cli.parse(args, flags = Set("once", "no-oph"))
    val spark = Cli.session("graft-neardup-stream")
    try run(spark, opts)
    finally spark.stop()
  }

  def run(spark: SparkSession, opts: Map[String, String]): Unit = {
    import org.apache.spark.sql.types._
    val store = Cli.required(opts, "store")
    val cfg = Dedup.MinHashConfig(
      numHashes = opts.getOrElse("num-hashes", "64").toInt,
      bands = opts.getOrElse("bands", "16").toInt,
      shingleSize = opts.getOrElse("shingle-size", "3").toInt,
      jaccardThreshold = opts.getOrElse("jaccard", "0.7").toDouble,
      seed = opts.getOrElse("seed", "42").toLong,
      oph = !opts.contains("no-oph"))
    val docs = spark.readStream
      .schema(StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
      .parquet(Cli.required(opts, "source"))
    val q = NearDupStream.nearDupSink(docs, store,
      Cli.required(opts, "output"), Cli.required(opts, "checkpoint"),
      cfg, once = opts.contains("once"))
    q.awaitTermination()
    opts.get("compact").foreach { n =>
      val rewritten = NearDupStream.compactStore(spark, store, n.toInt)
      println(s"[graft] compacted $rewritten store partitions at $store")
    }
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
