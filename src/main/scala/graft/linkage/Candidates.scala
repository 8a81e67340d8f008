package graft.linkage

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Candidate-pair generation: blocked self-join per pass, `id_a < id_b`
  * pair dedup, cross-pass union+distinct (reference J1/U1,
  * matching.py:390–470; SURVEY.md §2.3/§2.7).
  *
  * Scale levers (SURVEY.md §4, §7.4.5):
  *  - oversized-block cap: blocks holding more than
  *    max(minBlockCap, ratioMax·N) records are dropped entirely — the
  *    reference's own 2% frequency guard (p-sig.json "filter": max 0.02).
  *  - salted triangle self-join for blocks above saltThreshold: rows get
  *    salt s = xxhash64(conv_id) mod S; each row is replicated into the S
  *    buckets {sorted(s, t) : t}, pairs join on (block_key, bucket) with
  *    the bucket required to equal the pair's own sorted salt pair, so
  *    every pair appears exactly once and the max join-partition size
  *    drops by ~S.
  *  - AQE skew-join stays on as the runtime backstop.
  */
object Candidates {

  case class Config(
      ratioMax: Double = 0.02,   // p-sig "filter" ratio
      minBlockCap: Long = 50,    // floor so tiny corpora keep their blocks
      saltThreshold: Long = 4096,// blocks bigger than this get salted
      salts: Int = 16)

  /** Pairs (id_a < id_b) from all passes over the records. */
  def candidates(records: DataFrame, passes: Seq[Blocking.Pass],
                 cfg: Config = Config()): DataFrame = {
    val total = records.count()
    val cap = math.max(cfg.minBlockCap, (cfg.ratioMax * total).toLong)
    val perPass = passes.map { p =>
      pairsForPass(Blocking.keyed(records, p), cap, cfg)
    }
    perPass.reduce(_ unionByName _)
      .dropDuplicates("id_a", "id_b")
  }

  /** Incremental candidates: pairs where AT LEAST ONE side is a new
    * record — the increment path's blocking stage. Old-old pairs are
    * never regenerated (scoring is deterministic, so their matches are
    * already in the previous run's output). Block sizes and the 2% cap
    * are evaluated over ALL records, exactly like a full run; a<b
    * normalization dedups the two join orders and new-new pairs. */
  def incrementalCandidates(allRecords: DataFrame, newRecords: DataFrame,
                            passes: Seq[Blocking.Pass],
                            cfg: Config = Config()): DataFrame = {
    val total = allRecords.count()
    val cap = math.max(cfg.minBlockCap, (cfg.ratioMax * total).toLong)
    val perPass = passes.map { p =>
      val keyedAll = Blocking.keyed(allRecords, p)
      val counts = keyedAll.groupBy("block_key").agg(count(lit(1)).as("n"))
      val keptAll = keyedAll.join(
        counts.filter(col("n") <= cap).select("block_key"), Seq("block_key"))
      val keptNew = Blocking.keyed(newRecords, p)
        .join(keptAll.select("block_key").distinct(), Seq("block_key"),
          "left_semi")
      val l = keptNew.select(col("block_key"), col("conv_id").as("new_id"))
      val r = keptAll.select(col("block_key").as("bk_r"),
        col("conv_id").as("other_id"))
      l.join(r, col("block_key") === col("bk_r") &&
          col("new_id") =!= col("other_id"))
        .select(least(col("new_id"), col("other_id")).as("id_a"),
          greatest(col("new_id"), col("other_id")).as("id_b"))
    }
    perPass.reduce(_ unionByName _)
      .dropDuplicates("id_a", "id_b")
  }

  private def pairsForPass(keyed: DataFrame, cap: Long,
                           cfg: Config): DataFrame = {
    val counts = keyed.groupBy("block_key").agg(count(lit(1)).as("n"))
    val kept = keyed.join(
      counts.filter(col("n") <= cap), Seq("block_key"))

    val small = kept.filter(col("n") <= cfg.saltThreshold)
    val big = kept.filter(col("n") > cfg.saltThreshold)

    val smallPairs = selfJoinPairs(small.drop("n"))
    val bigPairs = saltedSelfJoinPairs(big.drop("n"), cfg.salts)
    smallPairs.unionByName(bigPairs)
  }

  /** Plain blocked self-join with a<b dedup (matching.py:450–461).
    * The right side's key is re-aliased so the equi-join condition binds
    * two distinct attributes (no reliance on Spark's self-join
    * disambiguation). */
  private def selfJoinPairs(keyed: DataFrame): DataFrame = {
    val l = keyed.select(col("block_key"), col("conv_id").as("id_a"))
    val r = keyed.select(col("block_key").as("bk_r"),
      col("conv_id").as("id_b"))
    l.join(r, col("block_key") === col("bk_r") && col("id_a") < col("id_b"))
      .select("id_a", "id_b")
  }

  /** Triangle-salted self-join: every pair lands in exactly one
    * (block_key, bucket). */
  private def saltedSelfJoinPairs(keyed: DataFrame, s: Int): DataFrame = {
    val salted = keyed.withColumn("salt",
      pmod(xxhash64(col("conv_id")), lit(s)).cast("int"))
    val replicated = salted
      .withColumn("other", explode(sequence(lit(0), lit(s - 1))))
      .withColumn("b_lo", least(col("salt"), col("other")))
      .withColumn("b_hi", greatest(col("salt"), col("other")))
      .drop("other")
    val l = replicated.select(col("block_key"), col("b_lo"), col("b_hi"),
      col("conv_id").as("id_a"), col("salt").as("salt_a"))
    val r = replicated.select(col("block_key").as("bk_r"), col("b_lo").as("lo_r"),
      col("b_hi").as("hi_r"), col("conv_id").as("id_b"),
      col("salt").as("salt_b"))
    l.join(r,
        col("block_key") === col("bk_r") &&
        col("b_lo") === col("lo_r") && col("b_hi") === col("hi_r") &&
        col("id_a") < col("id_b"))
      // count each pair once: only in the bucket equal to its salt pair
      .filter(col("b_lo") === least(col("salt_a"), col("salt_b")) &&
        col("b_hi") === greatest(col("salt_a"), col("salt_b")))
      .select("id_a", "id_b")
  }
}
