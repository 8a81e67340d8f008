package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.linkage.{Pipeline, TableIO}

/** Continuous record linkage: a foreachBatch sink that links every
  * micro-batch of NEW conversations against the accumulated corpus via
  * [[Pipeline.incremental]] — the streaming composition of the engine's
  * ingest and daily-append paths, so a deployment can keep clusters
  * current without ever re-scoring the full corpus.
  *
  * Store layout v2 (`storeDir/`) — delta logs + one generational table:
  *
  *   records_log/batch=<id>/    the batch's OWN folded records (piiCols)
  *   matches_log/batch=<id>/    the batch's NEWLY found matched pairs
  *   g0/, g1/                   alternating GENERATIONS of clusters only
  *   _state.json                {"version":2,"gen":<g>,"batch":<id>}
  *
  * records and matched_pairs are append-only in CONTENT (a conversation
  * folds once; a found match is never retracted), so each batch appends
  * exactly its O(batch) delta to the two logs — v1 rewrote all three
  * cumulative tables per trigger, an O(corpus) write per batch, the
  * scale-killer VERDICT r04 flagged. Only clusters, whose labels can
  * change on every batch, keeps the generational rewrite.
  *
  * Consistency and exactly-once ride on the committed pointer:
  *  - log partitions are named by BATCH ID and every reader (including
  *    the next batch's own incremental inputs) filters
  *    batch <= state.batch, so partially written / uncommitted partitions
  *    are invisible — partition pruning makes the filter free;
  *  - a foreachBatch replay after a crash re-OVERWRITES its own two
  *    partitions (same deterministic input → same content) and the other
  *    clusters generation, then flips the pointer — idempotent;
  *  - a replay AFTER the flip is detected by `batch <= state.batch` and
  *    skipped — exactly-once table commits on at-least-once delivery.
  *  Because appends land in fresh partition directories, no batch ever
  *  writes a path its own inputs are lazily reading (the self-overwrite
  *  class v1's generation flip existed to dodge for all three tables —
  *  now only clusters needs it).
  *
  * Contract (same as Pipeline.incremental): a conversation arrives
  * WHOLLY within one micro-batch (append-only corpus of complete
  * conversations). For raw turn streams, close conversations first with
  * [[TranscriptStream.foldStream]] and feed a downstream batch join, or
  * batch the source by conversation.
  */
object LinkageStream {

  /** Bumped when the store layout changes. v1 (no version field in
    * _state.json) kept cumulative records/matched_pairs per generation. */
  val StoreVersion = 2

  case class StoreState(gen: Int, batch: Long)

  /** Start the sink. `turns` is a streaming DataFrame of transcript
    * turns (conv_id, turn_idx, role, text, tool, ts). `once = true`
    * processes everything currently available and stops
    * (Trigger.AvailableNow — the scheduled-job deployment shape: each
    * invocation links whatever arrived since the last, then exits). */
  def linkageSink(turns: DataFrame, storeDir: String, checkpointDir: String,
                  cfg: Pipeline.Config = Pipeline.Config(),
                  once: Boolean = false): StreamingQuery = {
    val writer = turns.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        linkBatch(batch, id, storeDir, cfg)
        ()
      }
    (if (once)
       writer.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
     else writer).start()
  }

  /** One micro-batch step (what the sink invokes; exposed for
    * deterministic testing and for driving the store in batch jobs).
    * Returns false when the batch was a skipped replay or empty.
    * Writes O(batch) rows to the two delta logs and rewrites only the
    * clusters table (see object doc). */
  def linkBatch(batch: DataFrame, batchId: Long, storeDir: String,
                cfg: Pipeline.Config = Pipeline.Config()): Boolean = {
    // the sink runs Pipeline.run for the FIRST batch and incremental for
    // the rest — modes that only exist on the full-run path would make
    // matching semantics depend on arrival batch (exactAddresses'
    // no-scoring contract, pairsFile bypass, bucketed attr side), so
    // refuse them rather than silently diverge
    require(!cfg.exactAddresses && cfg.pairsFile.isEmpty &&
      cfg.bucketedRecords.isEmpty,
      "exactAddresses/pairsFile/bucketedRecords are full-run-only modes " +
        "the incremental path does not honor — unsupported in the " +
        "continuous sink")
    val spark = batch.sparkSession
    val st = readState(spark, storeDir)
    st.foreach { s =>
      if (batchId == s.batch) return false // in-flight replay, committed
      // ids below the committed pointer mean the stream's CHECKPOINT was
      // reset against a kept store: skipping would silently discard
      // every batch until ids catch up — fail loudly instead
      require(batchId > s.batch,
        s"batch id $batchId is behind the store's committed ${s.batch} " +
          s"($storeDir): streaming checkpoint was reset against an " +
          "existing store — resume with the original checkpoint dir or " +
          "point the sink at a fresh store")
    }
    if (batch.isEmpty) return false // nothing to link, nothing to commit
    val (result, nextGen) = st match {
      case None => (Pipeline.run(spark, batch, cfg), 0)
      case Some(s) =>
        (Pipeline.incremental(spark,
          readLog(spark, s"$storeDir/records_log", s.batch),
          readLog(spark, s"$storeDir/matches_log", s.batch), batch, cfg),
          1 - s.gen)
    }
    // delta rows for the logs: the increment's own records/new matches;
    // a FIRST batch's full result IS its delta. Both paths project to
    // the common piiCols schema (the full run's Fold output is wider —
    // ts_min/ts_max — and the log schema must not depend on arrival
    // order).
    val deltaRecords = result.deltaRecords.getOrElse(result.records)
      .select(Pipeline.piiCols.map(col): _*)
    val deltaMatches = result.deltaMatches.getOrElse(result.matchedPairs)
    // idempotent per-batch partitions: a replay overwrites its own dirs
    deltaRecords.write.mode("overwrite")
      .parquet(s"$storeDir/records_log/batch=$batchId")
    deltaMatches.write.mode("overwrite")
      .parquet(s"$storeDir/matches_log/batch=$batchId")
    // new partition dirs dodge the self-overwrite class, but the session
    // FileStatusCache may still hold the roots' pre-append listings
    spark.catalog.refreshByPath(s"$storeDir/records_log")
    spark.catalog.refreshByPath(s"$storeDir/matches_log")
    TableIO.write(result.clusters, s"$storeDir/g$nextGen/clusters")
    result.unpersist()
    writeState(spark, storeDir, StoreState(nextGen, batchId))
    true
  }

  /** Committed log view: partitions at or below the committed batch
    * pointer (partition-pruned filter), partition column dropped. */
  private def readLog(spark: SparkSession, root: String,
                      upTo: Long): DataFrame =
    spark.read.parquet(root)
      .filter(col("batch") <= upTo)
      .drop("batch")

  /** The current cumulative clusters / records / matched_pairs.
    *
    * records/matches are APPEND-ONLY logs: the returned plans stay valid
    * indefinitely (new partitions are simply not in the committed
    * filter). clusters reads the generation the pointer names AT CALL
    * TIME, and that generation's directory is REWRITTEN two committed
    * batches later — a clusters DataFrame held across batches can hit
    * missing files or a mixed snapshot. Materialize within the window,
    * or pass snapshot = true to localCheckpoint the result (eager,
    * lineage-free — survives any number of generation flips; release it
    * with DatasetBridge.releaseCheckpoint when done). */
  def currentClusters(spark: SparkSession, storeDir: String,
                      snapshot: Boolean = false): DataFrame = {
    val st = requireState(spark, storeDir)
    val df = TableIO.read(spark, s"$storeDir/g${st.gen}/clusters")
    if (snapshot) df.localCheckpoint() else df
  }
  def currentRecords(spark: SparkSession, storeDir: String): DataFrame =
    readLog(spark, s"$storeDir/records_log",
      requireState(spark, storeDir).batch)
  def currentMatches(spark: SparkSession, storeDir: String): DataFrame =
    readLog(spark, s"$storeDir/matches_log",
      requireState(spark, storeDir).batch)

  private def requireState(spark: SparkSession,
                           storeDir: String): StoreState =
    readState(spark, storeDir).getOrElse(
      throw new IllegalStateException(s"no linkage store at $storeDir"))

  /** One-time v1 → v2 in-place migration: the v1 generation's cumulative
    * records/matched_pairs become the logs' single opening partition
    * (batch = the committed pointer), clusters stay where they are, and
    * the pointer gains the version stamp. */
  def migrateStore(spark: SparkSession, storeDir: String): Unit = {
    val raw = readRawState(spark, storeDir).getOrElse(
      throw new IllegalStateException(s"no linkage store at $storeDir"))
    require(raw._3.isEmpty,
      s"$storeDir is already a v${raw._3.get} store")
    val (gen, batch) = (raw._1, raw._2)
    TableIO.read(spark, s"$storeDir/g$gen/records")
      .select(Pipeline.piiCols.map(col): _*)
      .write.mode("overwrite")
      .parquet(s"$storeDir/records_log/batch=$batch")
    TableIO.read(spark, s"$storeDir/g$gen/matched_pairs")
      .write.mode("overwrite")
      .parquet(s"$storeDir/matches_log/batch=$batch")
    // v1 kept clusters under g<gen>/clusters too — layout unchanged
    writeState(spark, storeDir, StoreState(gen, batch))
  }

  private[graft] def readState(spark: SparkSession,
                               storeDir: String): Option[StoreState] =
    readRawState(spark, storeDir).map { case (gen, batch, version) =>
      require(version.contains(StoreVersion),
        s"linkage store $storeDir is layout v${version.getOrElse(1)}, " +
          s"engine supports v$StoreVersion — run " +
          "LinkageStream.migrateStore once")
      StoreState(gen, batch)
    }

  /** (gen, batch, version?) without the version gate — the migration
    * entry point needs to read v1 pointers. */
  private def readRawState(spark: SparkSession, storeDir: String)
      : Option[(Int, Long, Option[Int])] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(storeDir), spark.sparkContext.hadoopConfiguration)
    // if only the tmp pointer exists, a crash hit the delete→rename
    // window: tmp was fully written+closed before the delete, so it IS
    // the committed state — without this fallback the next batch would
    // see "no store" and restart from scratch over live generations
    val main = new org.apache.hadoop.fs.Path(s"$storeDir/_state.json")
    val tmp = new org.apache.hadoop.fs.Path(s"$storeDir/_state.json.tmp")
    val p = if (fs.exists(main)) main
            else if (fs.exists(tmp)) tmp
            else main
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val txt = scala.io.Source.fromInputStream(in).mkString
      in.close()
      val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(txt)
      // fail LOUDLY on a malformed pointer: path(..).asInt() defaults of
      // a partial file would silently point reads at the wrong
      // generation and re-admit committed batches
      require(node.has("gen") && node.has("batch"),
        s"corrupt linkage-store pointer $p: '$txt'")
      Some((node.get("gen").asInt(), node.get("batch").asLong(),
        if (node.has("version")) Some(node.get("version").asInt()) else None))
    }
  }

  private[graft] def writeState(spark: SparkSession, storeDir: String,
                                st: StoreState): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(storeDir), spark.sparkContext.hadoopConfiguration)
    // temp + rename: fs.create(overwrite) truncates in place, so a crash
    // mid-write would leave an empty/partial pointer and brick the store
    // even though both generations' data is intact; rename is atomic on
    // HDFS and the local FS
    val tmp = new org.apache.hadoop.fs.Path(s"$storeDir/_state.json.tmp")
    val dst = new org.apache.hadoop.fs.Path(s"$storeDir/_state.json")
    val out = fs.create(tmp, true)
    out.write((s"""{"version":$StoreVersion,"gen":${st.gen},""" +
      s""""batch":${st.batch}}""").getBytes("UTF-8"))
    out.close()
    if (fs.exists(dst)) fs.delete(dst, false)
    require(fs.rename(tmp, dst), s"pointer rename failed: $tmp -> $dst")
  }
}

/** spark-submit surface for the continuous-linkage sink:
  *
  *   spark-submit --class graft.streaming.LinkageStreamMain <jar> \
  *     --source <dir of incoming transcript parquet files> \
  *     --store <linkage store dir> --checkpoint <dir> [--once]
  *     [--max-turns <n>]
  *
  * The file source picks up parquet files of transcript turns as they
  * land under --source. `--once` processes everything currently
  * available and exits (Trigger.AvailableNow) — the cron/Airflow
  * deployment shape: each invocation links the files that arrived since
  * the previous one, resuming from the same checkpoint; without it the
  * query runs until killed. Same conversation-wholeness contract as
  * [[LinkageStream.linkageSink]]. */
object LinkageStreamMain {
  import graft.linkage.Cli

  def main(args: Array[String]): Unit = {
    val opts = Cli.parse(args, flags = Set("once"))
    val spark = Cli.session("graft-linkage-stream")
    try run(spark, opts)
    finally spark.stop()
  }

  def run(spark: SparkSession, opts: Map[String, String]): Unit = {
    val turns = spark.readStream
      .schema(graft.linkage.Schemas.transcripts)
      .parquet(Cli.required(opts, "source"))
    // the runaway-conversation fold guard matters MOST on a long-running
    // stream — one looping agent conversation in a drop would otherwise
    // blow the fold's aggregation buffer on every retry of its batch
    val cfg = Pipeline.Config(
      maxTurns = opts.get("max-turns").map(_.toInt).getOrElse(0))
    val q = LinkageStream.linkageSink(turns,
      Cli.required(opts, "store"), Cli.required(opts, "checkpoint"),
      cfg, once = opts.contains("once"))
    q.awaitTermination()
  }
}
