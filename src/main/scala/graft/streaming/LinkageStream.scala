package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import graft.linkage.{Pipeline, TableIO}

/** Continuous record linkage: a foreachBatch sink that links every
  * micro-batch of NEW conversations against the accumulated corpus via
  * [[Pipeline.incremental]] — the streaming composition of the engine's
  * ingest and daily-append paths, so a deployment can keep clusters
  * current without ever re-scoring the full corpus.
  *
  * Store layout (`storeDir/`):
  *   g0/, g1/       alternating GENERATIONS of the cumulative tables
  *                  (records, matched_pairs, clusters — TableIO layout)
  *   _state.json    {"gen": <current>, "batch": <last committed id>}
  *
  * Generations exist because the incremental result's plans lazily READ
  * the previous tables: writing the new tables over the path being read
  * is the self-overwrite class this repo documents — each batch writes
  * the OTHER generation and flips the pointer only after every table
  * landed. Restart semantics ride on that pointer: foreachBatch replays
  * the in-flight batch after a crash, and
  *  - a crash BEFORE the pointer flip re-runs the batch into the same
  *    target generation (mode=overwrite, same deterministic input);
  *  - a replay AFTER the flip is detected by `batch <= state.batch` and
  *    skipped — exactly-once table commits on at-least-once delivery.
  *
  * Contract (same as Pipeline.incremental): a conversation arrives
  * WHOLLY within one micro-batch (append-only corpus of complete
  * conversations). For raw turn streams, close conversations first with
  * [[TranscriptStream.foldStream]] and feed a downstream batch join, or
  * batch the source by conversation.
  */
object LinkageStream {

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
    *
    * Every batch rewrites the cumulative tables in full — a deliberate
    * trade: the generation flip gives ATOMIC snapshot semantics (readers
    * always see one consistent {records, matched_pairs, clusters} set),
    * at O(corpus) write per trigger. records/matched_pairs are
    * append-only in content, so a delta-log layout (append-only record/
    * match logs + generational clusters) halves the steady-state I/O —
    * the right evolution once trigger latency matters more than the
    * single-pointer simplicity; clusters genuinely need the rewrite
    * either way (labels can change on every batch). */
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
        val prev = s"$storeDir/g${s.gen}"
        (Pipeline.incremental(spark,
          TableIO.read(spark, s"$prev/records"),
          TableIO.read(spark, s"$prev/matched_pairs"), batch, cfg),
          1 - s.gen)
    }
    val dst = s"$storeDir/g$nextGen"
    // project BOTH paths to the common piiCols schema: the full-run
    // first batch otherwise writes Fold's wider shape (ts_min/ts_max)
    // and the store's records schema would flip after the second batch
    TableIO.write(result.records
      .select(Pipeline.piiCols.map(org.apache.spark.sql.functions.col): _*),
      s"$dst/records")
    TableIO.write(result.matchedPairs, s"$dst/matched_pairs")
    TableIO.write(result.clusters, s"$dst/clusters")
    result.unpersist()
    writeState(spark, storeDir, StoreState(nextGen, batchId))
    true
  }

  /** The current generation's cumulative clusters / records /
    * matched_pairs. */
  def currentClusters(spark: SparkSession, storeDir: String): DataFrame =
    currentTable(spark, storeDir, "clusters")
  def currentRecords(spark: SparkSession, storeDir: String): DataFrame =
    currentTable(spark, storeDir, "records")
  def currentMatches(spark: SparkSession, storeDir: String): DataFrame =
    currentTable(spark, storeDir, "matched_pairs")

  private def currentTable(spark: SparkSession, storeDir: String,
                           name: String): DataFrame = {
    val st = readState(spark, storeDir).getOrElse(
      throw new IllegalStateException(s"no linkage store at $storeDir"))
    TableIO.read(spark, s"$storeDir/g${st.gen}/$name")
  }

  private[graft] def readState(spark: SparkSession,
                               storeDir: String): Option[StoreState] = {
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
      Some(StoreState(node.get("gen").asInt(), node.get("batch").asLong()))
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
    out.write(s"""{"gen":${st.gen},"batch":${st.batch}}""".getBytes("UTF-8"))
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
