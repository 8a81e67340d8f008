package graft.data

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus mixing — the stage between curation and
  * tokenization in a training-data pipeline: domain-weighted
  * subsampling ("20% code, 5% forums, the rest web") and a per-epoch
  * global shuffle order. Every decision is a pure function of
  * (id, seed), never of partitioning or iteration order, so a run is
  * reproducible across cluster sizes, restarts, and engines (the
  * oracle replays the exact sample in DuckDB via the md5 hash variant,
  * q_mix_sample / q_epoch_order).
  *
  * Both ops are shuffle-free per-row projections except the one range
  * exchange epoch ordering inherently needs to materialize a total
  * order (and that rides the linkage engine's Positions kernel — never
  * a single-partition window).
  */
object Mix {

  /** Sampling resolution: weights quantize to 1/Buckets (1e-6). */
  val Buckets = 1000000L

  /** Per-doc bucket in [0, Buckets), a pure function of (id, seed).
    * The hash input is the STRING "id:seed" so any engine can replay
    * it; both xxhash64 (default) and the md5-60-bit oracle variant are
    * non-negative under pmod. */
  def mixBucket(id: Column, seed: Long,
                hash: Column => Column = xxhash64(_)): Column =
    pmod(hash(concat(id.cast("string"), lit(":" + seed))), lit(Buckets))

  /** Domain-weighted deterministic sample: keep a doc iff
    * mixBucket < weight(domain)·Buckets. `weights` maps a domain value
    * to its keep rate in [0, 1]; unlisted domains use `defaultWeight`.
    * The lookup compiles to ONE CaseWhen chain over the domain column
    * (single dict-lookup semantics, cheap literal branches) and the
    * whole op is a codegen'd filter — zero shuffle, linear in the scan,
    * trivially parallel at any corpus size. Upsampling (weight > 1)
    * is deliberately out of scope for the FILTER — [[repeatByDomain]]
    * handles factors above 1 by emitting copies. */
  def sampleByDomain(docs: DataFrame, weights: Map[String, Double],
                     defaultWeight: Double = 1.0,
                     domainCol: String = "source",
                     idCol: String = "doc_id", seed: Long = 42L,
                     hash: Column => Column = xxhash64(_)): DataFrame = {
    require((weights.values ++ Seq(defaultWeight)).forall(w =>
      w >= 0.0 && w <= 1.0),
      s"weights must be in [0, 1]: $weights default=$defaultWeight")
    def toThresh(w: Double): Column = lit(math.round(w * Buckets))
    // sorted for a deterministic plan; foldRight keeps map order out of
    // the CaseWhen branch order
    val thresh = weights.toSeq.sortBy(_._1)
      .foldRight(toThresh(defaultWeight)) { case ((d, w), acc) =>
        when(col(domainCol) === d, toThresh(w)).otherwise(acc)
      }
    docs.filter(mixBucket(col(idCol), seed, hash) < thresh)
  }

  /** Domain-weighted deterministic REPETITION — the upsampling half of
    * data mixing ("see code 2.5× per epoch, forums 0.3×"). Each doc
    * gets `floor(f)` copies plus one more iff
    * mixBucket < frac(f)·Buckets, so E[copies] = f exactly and every
    * decision is the same pure function of (id, seed) as
    * [[sampleByDomain]] (which this subsumes at f < 1). Output repeats
    * each surviving input row with `copy_idx` = 0..n-1 appended —
    * downstream epoch shuffling should rank by (id, copy_idx) so
    * copies land apart (see [[epochOrder]]'s orderBy contract).
    *
    * Scale shape: a codegen'd CaseWhen pair (integer base + fractional
    * threshold, both driver-computed literals so no FP divergence
    * across engines) and ONE narrow explode — zero shuffle, output
    * linear in Σf·|domain|. Factors are capped at [0, 100]: repetition
    * beyond ~a few× is an epoch-schedule smell, and the cap bounds a
    * fat-finger explode amplification. */
  def repeatByDomain(docs: DataFrame, factors: Map[String, Double],
                     defaultFactor: Double = 1.0,
                     domainCol: String = "source",
                     idCol: String = "doc_id", seed: Long = 42L,
                     hash: Column => Column = xxhash64(_)): DataFrame = {
    require((factors.values ++ Seq(defaultFactor)).forall(f =>
      f >= 0.0 && f <= 100.0),
      s"factors must be in [0, 100]: $factors default=$defaultFactor")
    def pick(lift: Double => Column): Column =
      factors.toSeq.sortBy(_._1)
        .foldRight(lift(defaultFactor)) { case ((d, f), acc) =>
          when(col(domainCol) === d, lift(f)).otherwise(acc)
        }
    val base = pick(f => lit(math.floor(f).toLong))
    val thresh = pick(f => lit(math.round((f - math.floor(f)) * Buckets)))
    val n = base +
      (mixBucket(col(idCol), seed, hash) < thresh).cast("long")
    docs.withColumn("_n_copies", n)
      .filter(col("_n_copies") > 0)
      .withColumn("copy_idx",
        explode(sequence(lit(0L), col("_n_copies") - 1)))
      .drop("_n_copies")
  }

  /** Deterministic global shuffle order for one training epoch: adds
    * `epoch_pos` = the doc's rank under (hash("id:seed:epoch"), id) —
    * a reproducible permutation of 0..n-1 that changes every epoch.
    * The unique id tie-break makes the order total even under hash
    * collisions. Positions are assigned by the Positions kernel (range
    * exchange + per-partition zipWithIndex): one range shuffle, no
    * single-partition window, no driver materialization. */
  def epochOrder(docs: DataFrame, epoch: Int, seed: Long = 42L,
                 idCol: String = "doc_id",
                 hash: Column => Column = xxhash64(_)): DataFrame = {
    val h = hash(concat(col(idCol).cast("string"), lit(s":$seed:$epoch")))
    graft.linkage.Positions.withPosition(
        docs.withColumn("_epoch_h", h),
        struct(col("_epoch_h"), col(idCol)), "epoch_pos")
      .drop("_epoch_h")
  }
}
