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
    * turns (conv_id, turn_idx, role, text, tool, ts). */
  def linkageSink(turns: DataFrame, storeDir: String, checkpointDir: String,
                  cfg: Pipeline.Config = Pipeline.Config()): StreamingQuery =
    turns.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        linkBatch(batch, id, storeDir, cfg)
        ()
      }
      .start()

  /** One micro-batch step (what the sink invokes; exposed for
    * deterministic testing and for driving the store in batch jobs).
    * Returns false when the batch was a skipped replay or empty. */
  def linkBatch(batch: DataFrame, batchId: Long, storeDir: String,
                cfg: Pipeline.Config = Pipeline.Config()): Boolean = {
    val spark = batch.sparkSession
    val st = readState(spark, storeDir)
    if (st.exists(_.batch >= batchId)) return false // committed replay
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
    TableIO.write(result.records.drop("turns"), s"$dst/records")
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
    val p = new org.apache.hadoop.fs.Path(s"$storeDir/_state.json")
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val txt = scala.io.Source.fromInputStream(in).mkString
      in.close()
      val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(txt)
      Some(StoreState(node.path("gen").asInt(), node.path("batch").asLong()))
    }
  }

  private def writeState(spark: SparkSession, storeDir: String,
                         st: StoreState): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(storeDir), spark.sparkContext.hadoopConfiguration)
    val out = fs.create(
      new org.apache.hadoop.fs.Path(s"$storeDir/_state.json"), true)
    out.write(s"""{"gen":${st.gen},"batch":${st.batch}}""".getBytes("UTF-8"))
    out.close()
  }
}
