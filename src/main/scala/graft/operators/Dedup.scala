package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T, VectorFunctions => V}

/** Deduplication operators for the LLM-data-pipeline surface: exact,
  * MinHash+LSH, SimHash, exact n-gram Jaccard, and embedding-cosine near-dup.
  *
  * Scale notes (100 TB): signatures are computed entirely map-side with
  * higher-order array functions (no explode, no shuffle); the only shuffles
  * are the LSH band join (which touches just colliding candidates, the point
  * of LSH) and final pair dedup. The exact-pair variants (n-gram Jaccard,
  * blocked cosine) are the small-scale baselines the approximate paths are
  * validated against.
  */
object Dedup {

  val Prime: Long = 2147483647L // 2^31-1, Mersenne — MinHash modulus

  /** Deterministic (a, b) permutation constants, seeded — identical on every
    * executor and across runs. */
  def permConstants(numPerm: Int, seed: Long = 42L): Seq[(Long, Long)] = {
    val r = new scala.util.Random(seed)
    Seq.fill(numPerm)((1L + r.nextInt(Int.MaxValue - 1).toLong,
      r.nextInt(Int.MaxValue).toLong))
  }

  /** Exact dedup: one representative row (min id) per distinct text.
    * Hash-groupBy — partial map-side aggregation + one shuffle on the text
    * key; at 100 TB swap the raw text key for `fingerprint(text)` (md5) to
    * keep shuffle rows small — `dedupExactByFingerprint` below.
    */
  def dedupExact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(col(textCol))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))
      .select(col(idCol), col(textCol), col("n_copies"))

  /** Exact dedup keyed on md5 fingerprint — constant-width shuffle key. */
  def dedupExactByFingerprint(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol), T.fingerprint(col(textCol)).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))

  /** MinHash signatures: `numPerm` min-hashes over k-char shingles, computed
    * with array built-ins only (map-side, codegen'd, zero shuffle).
    * h_j(s) = (a_j * xxhash64(s) + b_j) mod p, sig_j = min over shingles.
    */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 8, numPerm: Int = 64): DataFrame = {
    val hashes = transform(T.shingles(col(textCol), shingleK),
      s => pmod(xxhash64(s), lit(Prime)))
    val sigCols = permConstants(numPerm).map { case (a, b) =>
      array_min(transform(hashes, h => pmod(h * a + b, lit(Prime))))
    }
    docs.select(col(idCol), array(sigCols: _*).as("sig"))
  }

  /** Banded LSH over MinHash signatures → candidate pairs with estimated
    * Jaccard (fraction of agreeing signature positions). `bands × rowsPerBand
    * = numPerm`; two docs collide in a band iff that band's signature slice
    * matches exactly, so the join only materializes plausible pairs.
    */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 8, numPerm: Int = 64, bands: Int = 16,
      threshold: Double = 0.5): DataFrame = {
    val rows = numPerm / bands
    val sigs = minhashSignatures(docs, idCol, textCol, shingleK, numPerm)
    val banded = sigs.select(col(idCol), col("sig"),
      posexplode(array((0 until bands).map { b =>
        xxhash64(concat_ws(",",
          transform(slice(col("sig"), b * rows + 1, rows), _.cast("string"))))
      }: _*)).as(Seq("band", "band_hash")))
    val l = banded.select(col(idCol).as("id_a"), col("sig").as("sig_a"),
      col("band"), col("band_hash"))
    val r = banded.select(col(idCol).as("id_b"), col("sig").as("sig_b"),
      col("band"), col("band_hash"))
    l.join(r, Seq("band", "band_hash"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, lit(1)).otherwise(lit(0))), _ === 1))
          / numPerm.toDouble).as("est_jaccard"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(first(col("est_jaccard")).as("est_jaccard"))
      .where(col("est_jaccard") >= threshold)
  }

  /** SimHash (Charikar): 64-bit signature where bit i is the sign of the
    * sum of ±1 votes from each token's hash bit i. Map-side only.
    */
  def simhash(text: Column): Column = {
    val hashes = transform(
      regexp_extract_all(lower(text), lit("\\S+"), lit(0)), xxhash64(_))
    val bits = (0 until 64).map { i =>
      val vote = aggregate(hashes, lit(0),
        (acc, h) => acc + when(shiftright(h, i).bitwiseAND(1) === 1, 1).otherwise(-1))
      when(vote > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bits.reduce[Column](_ bitwiseOR _)
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming, found via
    * chunk blocking: with `n` chunks, distance ≤ n-1 ⇒ at least one chunk is
    * identical (pigeonhole), so candidates come from equi-joins on chunks —
    * no cross join. Chunk count is the smallest power-of-two > maxHamming
    * (4/8/16), trading candidate volume against distance budget.
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 15, "chunk blocking supports distance <= 15 (16 chunks)")
    val nChunks = if (maxHamming <= 3) 4 else if (maxHamming <= 7) 8 else 16
    val width = 64 / nChunks
    val mask = (1L << width) - 1
    val sh = docs.select(col(idCol), simhash(col(textCol)).as("sh"))
    val chunked = sh.select(col(idCol), col("sh"),
      posexplode(array((0 until nChunks).map(c =>
        shiftright(col("sh"), c * width).bitwiseAND(mask)): _*))
        .as(Seq("chunk", "chunk_val")))
    val l = chunked.select(col(idCol).as("id_a"), col("sh").as("sh_a"),
      col("chunk"), col("chunk_val"))
    val r = chunked.select(col(idCol).as("id_b"), col("sh").as("sh_b"),
      col("chunk"), col("chunk_val"))
    l.join(r, Seq("chunk", "chunk_val"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(min(col("hamming")).as("hamming"))
      .where(col("hamming") <= maxHamming)
  }

  /** Exact n-gram Jaccard pairs — the ground-truth baseline for MinHash.
    * Explodes distinct shingles and equi-joins on the shingle; quadratic in
    * docs sharing a shingle, so for 100 TB use `minhashLshPairs` and keep
    * this for validation samples.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 8, threshold: Double = 0.5): DataFrame = {
    val sh = docs.select(col(idCol).as("id"),
      T.shingles(col(textCol), shingleK).as("grams"))
      .select(col("id"), size(col("grams")).as("n_grams"),
        explode(col("grams")).as("g"))
    val l = sh.select(col("id").as("id_a"), col("n_grams").as("na"), col("g"))
    val r = sh.select(col("id").as("id_b"), col("n_grams").as("nb"), col("g"))
    l.join(r, "g").where(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("common"), first("na").as("na"), first("nb").as("nb"))
      .select(col("id_a"), col("id_b"),
        (col("common") / (col("na") + col("nb") - col("common"))).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Embedding-cosine near-dup pairs, blocked by a key column (e.g. a coarse
    * cluster/label or an LSH bucket) so the pair join is per-block, never a
    * global cross join.
    */
  def embeddingNearDupPairs(embeddings: DataFrame, idCol: String,
      vecCol: String, blockCol: String, threshold: Double): DataFrame = {
    val l = embeddings.select(col(blockCol).as("blk"), col(idCol).as("id_a"),
      col(vecCol).as("v_a"))
    val r = embeddings.select(col(blockCol).as("blk"), col(idCol).as("id_b"),
      col(vecCol).as("v_b"))
    l.join(r, "blk").where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(V.cosine(col("v_a"), col("v_b")), 6).as("cos"))
      .where(col("cos") >= threshold)
  }
}
