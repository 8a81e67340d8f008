package graft.data

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Large-scale document deduplication (training-data pipeline ops).
  * All stages are pure DataFrame transforms — no UDFs — so every hash,
  * min-aggregation and band join stays in whole-stage codegen and scales
  * by partitioning alone:
  *
  *  - exact:   hash-groupBy keep-min (one shuffle)
  *  - MinHash: shingle → k seeded min-hashes → band → bucket self-join →
  *             exact-Jaccard verification (classic LSH; false positives
  *             killed by the verify stage, false negatives bounded by
  *             (1-s^r)^b)
  *  - SimHash: 64-bit sign-sum signature; near-dups via 4×16-bit band
  *             join + bit_count(xor) Hamming verify
  *  - n-gram Jaccard: exact set overlap via explode + count joins
  */
object Dedup {

  // ---------- exact ----------

  /** Exact dedup: keep the smallest id per identical text.
    * Returns (id, keeper, group_size). */
  def exact(docs: DataFrame, idCol: String = "doc_id",
            textCol: String = "text"): DataFrame = {
    val h = xxhash64(col(textCol))
    docs.groupBy(h.as("text_hash"))
      .agg(min(col(idCol)).as("keeper"),
        count(lit(1)).as("group_size"),
        sort_array(collect_list(col(idCol))).as("ids"))
      .select(explode(col("ids")).as(idCol), col("keeper"),
        col("group_size"))
  }

  // ---------- shingling ----------

  /** Word n-gram shingles of a normalized text column. Texts shorter than
    * n words shingle to the whole text.
    *
    * Built by zip_with over shifted slices — O(n·k) per doc. (The naive
    * transform(sequence, i => element_at(toks, i+j)) is O(n²) because
    * element_at walks the array per index; at 2k-token docs that was the
    * whole pipeline's bottleneck.) */
  def shingles(textCol: Column, n: Int = 3): Column = {
    val toks = split(trim(textCol), "\\s+")
    val cnt = size(toks)
    val grams = wordNgrams(toks, cnt, n)
    when(cnt >= n, grams).otherwise(array(trim(textCol)))
  }

  /** n-grams of a token array via iterated zip_with against shifted
    * slices; concat (not concat_ws) so the null padding of the shorter
    * slice nulls out incomplete grams, which are then filtered. */
  private[graft] def wordNgrams(toks: Column, cnt: Column, n: Int): Column = {
    val joined = (2 to n).foldLeft(toks) { (acc, k) =>
      zip_with(acc, slice(toks, lit(k), greatest(cnt - (k - 1), lit(0))),
        (a, b) => concat(a, lit(" "), b))
    }
    filter(joined, g => g.isNotNull)
  }

  /** (id, shingle) distinct pairs. */
  def explodedShingles(docs: DataFrame, idCol: String = "doc_id",
                       textCol: String = "text", n: Int = 3): DataFrame =
    docs.select(col(idCol), explode(shingles(col(textCol), n)).as("shingle"))
      .distinct()

  // ---------- MinHash + LSH ----------

  case class MinHashConfig(
      numHashes: Int = 64,
      bands: Int = 16,
      shingleSize: Int = 3,
      jaccardThreshold: Double = 0.7,
      seed: Long = 42L)

  /** MinHash signatures: (id, sig: array<long> of numHashes mins).
    * Each hash_i(shingle) = xxhash64(seed, i, shingle); one groupBy
    * computes all k mins (map-side partial aggregation applies). */
  def minHashSignatures(exploded: DataFrame, cfg: MinHashConfig,
                        idCol: String = "doc_id"): DataFrame = {
    val minExprs = (0 until cfg.numHashes).map(i =>
      min(xxhash64(lit(cfg.seed), lit(i), col("shingle"))).as(s"mh_$i"))
    exploded.groupBy(col(idCol))
      .agg(minExprs.head, minExprs.tail: _*)
      .select(col(idCol),
        array((0 until cfg.numHashes).map(i => col(s"mh_$i")): _*).as("sig"))
  }

  /** LSH band buckets: (band, bucket, id). r = numHashes/bands rows per
    * band hashed together. */
  def lshBuckets(signatures: DataFrame, cfg: MinHashConfig,
                 idCol: String = "doc_id"): DataFrame = {
    val r = cfg.numHashes / cfg.bands
    require(r * cfg.bands == cfg.numHashes, "bands must divide numHashes")
    val bandRows = (0 until cfg.bands).map { b =>
      val bandSlice = slice(col("sig"), b * r + 1, r)
      signatures.select(lit(b).as("band"),
        xxhash64(lit(b), concat_ws(",", bandSlice)).as("bucket"),
        col(idCol))
    }
    bandRows.reduce(_ unionByName _)
  }

  /** Candidate pairs from shared (band, bucket), a<b, deduped. */
  def lshCandidates(buckets: DataFrame,
                    idCol: String = "doc_id"): DataFrame = {
    val l = buckets.select(col("band"), col("bucket"),
      col(idCol).as("id_a"))
    val r = buckets.select(col("band").as("band_r"),
      col("bucket").as("bucket_r"), col(idCol).as("id_b"))
    l.join(r, col("band") === col("band_r") &&
        col("bucket") === col("bucket_r") && col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Exact Jaccard on shingle sets for candidate pairs (verify stage).
    * Two joins + one agg; |A| and |B| come from a pre-agg broadcast. */
  def jaccardVerify(exploded: DataFrame, pairs: DataFrame,
                    idCol: String = "doc_id"): DataFrame = {
    val sizes = exploded.groupBy(col(idCol))
      .agg(count(lit(1)).as("set_size"))
    val ea = exploded.toDF("id_a", "shingle")
    val eb = exploded.toDF("id_b", "shingle")
    val inter = pairs
      .join(ea, "id_a").join(eb, Seq("id_b", "shingle"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(inter, Seq("id_a", "id_b"), "left")
      .na.fill(0L, Seq("inter"))
      .join(sizes.toDF("id_a", "size_a"), "id_a")
      .join(sizes.toDF("id_b", "size_b"), "id_b")
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("size_a") + col("size_b") - col("inter")))
      .select("id_a", "id_b", "jaccard")
  }

  /** Full MinHash-LSH near-dup pipeline: returns verified near-dup pairs
    * (id_a, id_b, jaccard ≥ threshold). */
  def minHashNearDups(docs: DataFrame, cfg: MinHashConfig = MinHashConfig(),
                      idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
    // persist the fan-out points: exploded feeds the signatures AND both
    // sides of the verify join; candidate pairs are consumed twice inside
    // verify — without caching those subtrees re-execute per consumer
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val exploded = explodedShingles(docs, idCol, textCol, cfg.shingleSize)
      .persist(lvl)
    val sigs = minHashSignatures(exploded, cfg, idCol).persist(lvl)
    val cands = lshCandidates(lshBuckets(sigs, cfg, idCol), idCol)
      .persist(lvl)
    jaccardVerify(exploded, cands, idCol)
      .filter(col("jaccard") >= cfg.jaccardThreshold)
  }

  // ---------- SimHash ----------

  /** 64-bit SimHash over word tokens: bit i = sign of Σ_tokens ±1 where
    * the sign is bit i of xxhash64(token). Returns (id, simhash). */
  def simHash(docs: DataFrame, idCol: String = "doc_id",
              textCol: String = "text"): DataFrame = {
    val tokens = docs.select(col(idCol),
      explode(split(trim(col(textCol)), "\\s+")).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map(i =>
      sum(when(shiftrightunsigned(col("h"), i).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"b_$i"))
    val sums = tokens.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 64).map(i =>
      when(col(s"b_$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
    sums.select(col(idCol), sig.as("simhash"))
  }

  /** SimHash near-dups: pairs at Hamming distance ≤ maxDistance, found by
    * joining on any of four 16-bit bands (exact for maxDistance ≤ 3 by
    * pigeonhole) then verified with bit_count(xor). */
  def simHashNearDups(sigs: DataFrame, maxDistance: Int = 3,
                      idCol: String = "doc_id"): DataFrame = {
    val banded = (0 until 4).map(b =>
      sigs.select(lit(b).as("band"),
        shiftrightunsigned(col("simhash"), b * 16)
          .bitwiseAND(lit(0xffffL)).as("bucket"),
        col(idCol), col("simhash")))
      .reduce(_ unionByName _)
    val l = banded.toDF("band", "bucket", "id_a", "sh_a")
    val r = banded.toDF("band_r", "bucket_r", "id_b", "sh_b")
    l.join(r, col("band") === col("band_r") &&
        col("bucket") === col("bucket_r") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDistance)
  }
}
