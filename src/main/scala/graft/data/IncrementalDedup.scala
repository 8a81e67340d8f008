package graft.data

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Daily-append near-dup dedup — the dedup family's analog of the
  * linkage engine's Pipeline.incremental (VERDICT r04 #4): new docs are
  * signed and bucketed, candidates are restricted to pairs TOUCHING at
  * least one new doc (old-old pairs are never regenerated — signatures
  * and verification are deterministic, so the previous run's pairs are
  * final), the exact-Jaccard verify explodes shingles only for new docs
  * plus the old docs candidates actually touch, and connected components
  * run over previous ∪ new edges.
  *
  * Two bucket sources for the PREVIOUS corpus:
  *  - `storePath = Some(p)`: a NearDupStream v2 bucketed signature store —
  *    the at-scale path. Only store partitions matching the NEW docs'
  *    (band, shard) footprint are read (the same pruned-read kernel the
  *    streaming gate uses), so the increment's IO is O(new footprint),
  *    not O(corpus). The store must cover exactly `prevDocs` and carry a
  *    matching minhash config (meta-fingerprint enforced upstream).
  *  - `storePath = None`: previous buckets are recomputed from
  *    `prevDocs` — one signature pass over the corpus (linear, no joins),
  *    still never a corpus × corpus candidate stage.
  *
  * Equivalence vs a full recompute has the same one documented divergence
  * as the linkage increment: a (band, bucket) that crosses the hot-bucket
  * cap only AFTER the increment keeps the pairs found while it was under
  * the cap — matches are never retracted. The cap itself is evaluated
  * over the COMBINED corpus size, exactly like a full run.
  */
object IncrementalDedup {

  /** Verified near-dup pairs (id_a < id_b, exact jaccard ≥ threshold)
    * with at least one NEW side. Returned persisted (caller unpersists). */
  def incrementalNearDupPairs(prevDocs: DataFrame, newDocs: DataFrame,
                              cfg: Dedup.MinHashConfig =
                                Dedup.MinHashConfig(),
                              idCol: String = "doc_id",
                              textCol: String = "text",
                              storePath: Option[String] = None,
                              combinedCount: Option[Long] = None)
      : DataFrame = {
    val spark = newDocs.sparkSession
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val newExploded = Dedup.explodedShingles(newDocs, idCol, textCol,
      cfg.shingleSize).persist(lvl)
    val newBuckets = Dedup.lshBuckets(
      Dedup.sigs(newExploded, cfg, idCol), cfg, idCol).persist(lvl)

    val prevBuckets = storePath match {
      case Some(p) =>
        val meta = graft.streaming.NearDupStream.readStoreMeta(spark, p)
          .getOrElse(throw new IllegalStateException(
            s"no signature store at $p"))
        require(meta.numHashes == cfg.numHashes && meta.bands == cfg.bands &&
          meta.shingleSize == cfg.shingleSize && meta.seed == cfg.seed &&
          meta.oph == cfg.oph,
          s"minhash config mismatch vs store meta at $p")
        val touched = newBuckets
          .select(col("band"),
            pmod(col("bucket"), lit(meta.shards.toLong)).cast("int")
              .as("shard"))
          .distinct().collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
        graft.streaming.NearDupStream.prunedStore(spark, p, idCol,
            newDocs.schema(idCol).dataType, touched)
          .select(col("band"), col("bucket"), col(idCol))
      case None =>
        Dedup.lshBuckets(Dedup.sigs(
          Dedup.explodedShingles(prevDocs, idCol, textCol, cfg.shingleSize),
          cfg, idCol), cfg, idCol)
    }

    // hot-bucket cap over the COMBINED relation, sized by the combined
    // corpus — identical to a full run's cap for every bucket the
    // increment can touch (a pruned store partition holds ALL rows of
    // its buckets, so counts there are complete).
    //
    // r06: localCheckpoint (lazy) instead of persist — `all` is
    // referenced by the stats pass, the candidate join AND (through
    // candIds → prevTouched → the verify shingles) the whole verify
    // tree, so with plain persist the LOGICAL plan duplicated the full
    // previous-corpus signature pipeline multiplicatively (measured: a
    // 3.2 M-char physical plan for q_neardup_incremental; every action
    // and every AQE re-optimization walked it — job walls of 0.3 s over
    // 7 ms of tasks). The checkpoint truncates lineage at the
    // materialization the stats pass performs anyway.
    val all = prevBuckets
      .select(col("band"), col("bucket"), col(idCol))
      .unionByName(newBuckets.select(col("band"), col("bucket"), col(idCol)))
      .localCheckpoint(eager = false)
    val keptOpt = storePath match {
      case None =>
        // storePath=None ⇒ `all` IS the complete corpus bucket relation
        // (every doc contributes exactly `bands` rows), so the cap's
        // corpus size is derived from the SAME stats pass the guard
        // already runs — the r05 shape paid prevDocs.count() +
        // newDocs.count() (a full column-pruned pass over the previous
        // corpus) per increment just to size the cap (VERDICT r05).
        Dedup.capBuckets(all, cfg.capRatio, cfg.minBucketCap,
          cfg.maxBucketCap, cfg.bands, "minhash-lsh-incremental")
      case Some(_) =>
        // pruned store legs undercount the corpus — size from counts the
        // caller already knows, or pay the two count jobs as before
        val n = combinedCount.getOrElse(prevDocs.count() + newDocs.count())
        Dedup.capBuckets(all, cfg.bucketCap(n), "minhash-lsh-incremental")
    }
    val kept = keptOpt.getOrElse(all)
    // steady state (no bucket over cap): every newBuckets row appears in
    // `all` by construction, so the kept-side semi-join is the identity —
    // keep the caller's plan free of it (one fewer join + exchange)
    val keptNew = keptOpt.map(k =>
      newBuckets.join(k.select(col("band"), col("bucket"), col(idCol)),
        Seq("band", "bucket", idCol), "left_semi")).getOrElse(newBuckets)

    // pairs touching >= 1 new doc; least/greatest + dedup collapses the
    // two join orders of new-new pairs
    val l = keptNew.select(col("band"), col("bucket"),
      col(idCol).as("new_id"))
    val r = kept.select(col("band").as("band_r"),
      col("bucket").as("bucket_r"), col(idCol).as("other_id"))
    // lazy localCheckpoint (not persist): cands is re-referenced by
    // candIds (twice) and both verify joins — each reference would embed
    // the full candidate-join lineage in the verify plan (the same
    // multiplicative plan-girth term as `all` above)
    val cands = l.join(r, col("band") === col("band_r") &&
        col("bucket") === col("bucket_r") &&
        col("new_id") =!= col("other_id"))
      .select(least(col("new_id"), col("other_id")).as("id_a"),
        greatest(col("new_id"), col("other_id")).as("id_b"))
      .dropDuplicates("id_a", "id_b")
      .localCheckpoint(eager = false)

    // exact verify: shingles for new docs + ONLY the prev docs that
    // appear in candidates (O(new × neighborhood), never the corpus)
    val candIds = cands.select(col("id_a").as(idCol))
      .unionByName(cands.select(col("id_b").as(idCol))).distinct()
    val prevTouched = prevDocs.join(candIds, Seq(idCol), "left_semi")
    val exploded = newExploded.unionByName(
        Dedup.explodedShingles(prevTouched, idCol, textCol, cfg.shingleSize))
      .localCheckpoint(eager = false)
    val out = Dedup.jaccardVerify(exploded, cands, idCol)
      .filter(col("jaccard") >= cfg.jaccardThreshold)
      .persist(lvl)
    out.count()
    newExploded.unpersist(blocking = false)
    newBuckets.unpersist(blocking = false)
    // checkpointed intermediates: Dataset.unpersist would not free their
    // blocks (see DatasetBridge) — release them now that `out` is
    // materialized; `out` itself stays a recompute-free persisted handle
    val rel = org.apache.spark.sql.graftbridge.DatasetBridge.releaseCheckpoint _
    rel(all); rel(cands); rel(exploded)
    out
  }

  /** Labels + cumulative pairs after an increment. Both frames are
    * localCheckpoint()'d (inert, generation-safe); release each with
    * DatasetBridge.releaseCheckpoint when done. */
  case class Result(labels: DataFrame, pairs: DataFrame)

  /** Incremental near-dup CLUSTERS: labels over prev ∪ new docs equal a
    * full [[Dedup.nearDupClusters]] recompute over the combined corpus
    * (IncrementalDedupSpec proves it across two increments), at
    * O(new × neighborhood) candidate/verify cost plus a CC over
    * previous ∪ new edges. `prevPairs` is the previous run's cumulative
    * verified-pair set ([[Dedup.minHashNearDups]] output or the previous
    * increment's Result.pairs). */
  def incrementalNearDupClusters(prevDocs: DataFrame, newDocs: DataFrame,
                                 prevPairs: DataFrame,
                                 cfg: Dedup.MinHashConfig =
                                   Dedup.MinHashConfig(),
                                 idCol: String = "doc_id",
                                 textCol: String = "text",
                                 ccOptions: graft.linkage.Cluster.Options =
                                   graft.linkage.Cluster.Options(),
                                 storePath: Option[String] = None): Result = {
    val spark = newDocs.sparkSession
    val newPairs = incrementalNearDupPairs(prevDocs, newDocs, cfg, idCol,
      textCol, storePath)
    val allPairs = prevPairs.select(col("id_a"), col("id_b"), col("jaccard"))
      .unionByName(newPairs.select(col("id_a"), col("id_b"), col("jaccard")))
      .dropDuplicates("id_a", "id_b")
      .localCheckpoint()
    val allIds = prevDocs.select(col(idCol))
      .unionByName(newDocs.select(col(idCol)))
    val labels = graft.linkage.Cluster.connectedComponents(spark,
      allPairs.select(col("id_a"), col("id_b")), ccOptions)
    val out = graft.linkage.Cluster.labelRecords(allIds, labels, idCol)
      .select(col(idCol), col("cluster_id"))
      .localCheckpoint()
    newPairs.unpersist(blocking = false)
    labels.unpersist(blocking = false)
    Result(out, allPairs)
  }
}
