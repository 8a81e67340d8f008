package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.DatasetBridge
import graft.data.Dedup

/** Streaming near-dup soak — the [[LinkageSoak]] treatment for the v2
  * bucketed signature store (VERDICT r04 #1): drive N micro-batches
  * through [[NearDupStream.nearDupBatch]] and measure per-trigger wall
  * as the store grows. Under the v1 flat layout every trigger re-read
  * and re-bucketed the WHOLE store (O(store) per batch); the v2
  * (band, shard)-partitioned layout reads only the batch's bucket
  * footprint, so per-trigger wall should stay flat while cumulative
  * admitted signatures grow ~linearly. Results land in BASELINE.md.
  *
  *   sbt -batch "runMain graft.streaming.NearDupSoakMain
  *     --workdir /tmp/ndsoak [--docs 50000] [--batches 10]"
  *
  * Corpus: deterministic token documents in families of 10 consecutive
  * ids — id 10g is the base, 10g+1/10g+2 are one-token garbles of it
  * (3-shingle Jaccard ≈ 0.9, well over the 0.7 gate), the rest unique.
  * Batch assignment hashes the doc id, so a family's members routinely
  * land in DIFFERENT batches and every trigger performs real
  * batch-vs-store matching, not just intra-batch dedup.
  */
object NearDupSoak {

  case class Trigger(batch: Int, wallSec: Double, batchDocs: Long,
                     survivors: Long, cumStoreRows: Long, storeFiles: Long)

  /** Deterministic doc corpus with planted cross-batch near-dup
    * families (see object doc). Pure function of (nDocs, seed). */
  def synthDocs(spark: SparkSession, nDocs: Int, seed: Long = 7L)
      : DataFrame = {
    import spark.implicits._
    spark.range(nDocs).map { id =>
      val i = id.toLong
      val fam = i / 10
      val member = (i % 10).toInt
      val isGarble = member == 1 || member == 2
      val srcId = if (isGarble) fam * 10 else i
      val rnd = new scala.util.Random(seed ^ (srcId * 0x9E3779B97F4A7C15L))
      val tokens = Array.fill(60)(s"w${rnd.nextInt(5000)}")
      if (isGarble) tokens(12 * member) = s"g$i" // one-token substitution
      (i, tokens.mkString(" "))
    }.toDF("doc_id", "text")
  }

  def run(spark: SparkSession, workDir: String, nDocs: Int,
          nBatches: Int,
          cfg: Dedup.MinHashConfig = Dedup.MinHashConfig(oph = true))
      : Seq[Trigger] = {
    val store = s"$workDir/store"
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val all = synthDocs(spark, nDocs).persist(lvl)
    all.count()
    val bucket = pmod(xxhash64(col("doc_id")), lit(nBatches.toLong))
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(workDir), spark.sparkContext.hadoopConfiguration)
    val out = (0 until nBatches).map { i =>
      val batch = all.filter(bucket === i)
      val batchDocs = batch.count()
      val t0 = System.nanoTime()
      val survivors = NearDupStream.nearDupBatch(batch, store, cfg)
      val nSurv = survivors.count()
      val wall = (System.nanoTime() - t0) / 1e9
      DatasetBridge.releaseCheckpoint(survivors)
      // store growth, measured OUTSIDE the timed trigger (a real sink
      // never counts its store)
      val cum = spark.read.parquet(s"$store/sigs").count() / cfg.bands
      val files = {
        val it = fs.listFiles(new org.apache.hadoop.fs.Path(s"$store/sigs"),
          true)
        var n = 0L
        while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
        n
      }
      val t = Trigger(i, wall, batchDocs, nSurv, cum, files)
      println(f"[graft-ndsoak] batch=$i%d wall=${t.wallSec}%.2fs " +
        f"batchDocs=$batchDocs%d survivors=$nSurv%d " +
        f"cumAdmitted=$cum%d storeFiles=$files%d")
      t
    }
    all.unpersist(blocking = false)
    out
  }
}

object NearDupSoakMain {
  import graft.linkage.Cli

  def main(args: Array[String]): Unit = {
    val opts = Cli.parse(args)
    sys.env.get("SPARK_GRAFT_SHUFFLE_PARTITIONS").foreach(p =>
      System.setProperty("spark.sql.shuffle.partitions", p))
    val spark = Cli.session("graft-neardup-soak")
    try {
      val triggers = NearDupSoak.run(spark, Cli.required(opts, "workdir"),
        opts.getOrElse("docs", "50000").toInt,
        opts.getOrElse("batches", "10").toInt)
      val js = triggers.map(t =>
        f"""{"batch":${t.batch},"wall_sec":${t.wallSec}%.2f,""" +
        s""""batch_docs":${t.batchDocs},"survivors":${t.survivors},""" +
        s""""cum_admitted":${t.cumStoreRows},""" +
        s""""store_files":${t.storeFiles}}""").mkString("[", ",", "]")
      println(s"""[graft-ndsoak-summary] {"triggers":$js}""")
    } finally spark.stop()
  }
}
