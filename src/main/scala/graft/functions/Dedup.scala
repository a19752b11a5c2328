package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, exact → near-dup:
  *
  *  - exact: hash-groupBy on a canonical fingerprint (one shuffle of
  *    (hash, id) pairs only — never the document bodies);
  *  - MinHash + LSH: shingle → minhash signature → banded bucket join →
  *    candidate pairs → Jaccard verify (the classic
  *    Broder/Leskovec-Rajaraman-Ullman pipeline). Candidate generation is
  *    |bands| × |docs| rows of small fixed width; the quadratic blow-up is
  *    confined to per-bucket self-joins, which LSH keeps tiny;
  *  - SimHash: 64-bit signature, near-dups = small Hamming distance, banded
  *    on 16-bit chunks so candidates come from equi-joins, not cross-joins;
  *  - n-gram Jaccard: exact verify on candidate pairs (or small corpora).
  *
  * Everything is native `Column` expressions — codegen'd, no UDFs.
  */
object Dedup {
  import TextFunctions._

  /** Scale-adaptive input widening for CPU-heavy per-document passes
    * (shingling, minhash/simhash signatures): a corpus that arrives in
    * fewer splits than cores — locally, one small parquet file — would run
    * the whole hashing pass on a handful of tasks while the rest of the
    * machine idles (guide-§2.5 "input skew: one huge unsplittable file …
    * repartition immediately after the read"). The round-robin exchange
    * moves each document's bytes exactly once, BEFORE any ×bands/×tables
    * expansion, and is skipped entirely whenever the scan already carries
    * enough splits — at 100 TB the condition never fires and the plan is
    * untouched. Also a plan win when the widened relation is consumed more
    * than once (signature + verify sides): the consumers share the one
    * exchange instead of re-running the scan.
    */
  private[graft] def widen(df: DataFrame): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 4 <= cores) df.repartition(cores) else df
  }

  /** Word n-gram shingles of a text column (falls back to the whole
    * normalized text when shorter than n tokens).
    */
  def shingles(c: Column, n: Int = 3): Column = {
    val toks = tokens(normalized(c))
    when(size(toks) >= n,
      array_distinct(transform(sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + 1, lit(n)), " "))))
      .otherwise(array(array_join(toks, " ")))
  }

  /** REFERENCE MinHash signature over a prebuilt string-shingle column —
    * the interpreted-HOF verify baseline ONLY. The scale path is
    * [[MinHash64.signature]] (one-pass kernel, ~2600× faster per its doc);
    * the two use DIFFERENT hash families, so their signatures must never be
    * mixed in one comparison (the `Ref` suffix marks that boundary).
    *
    * k independent permutations. Each shingle STRING is
    * hashed exactly once (xxhash64 over bytes); the k permutations derive
    * from that 64-bit value via fixed-width re-hashes — the standard
    * one-hash/k-permutations trick, ~k× less string hashing than hashing
    * every shingle k times.
    */
  def minhashSignatureRef(shingleCol: Column, k: Int = 32): Column = {
    val hs = transform(shingleCol, x => xxhash64(x))
    transform(sequence(lit(0), lit(k - 1)),
      j => array_min(transform(hs, h => xxhash64(h, j))))
  }

  /** LSH band hashes of a minhash signature: `bands` hashes, each over
    * `rowsPerBand` consecutive signature slots. Two docs sharing ANY band
    * hash are candidates.
    */
  def lshBandHashes(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => xxhash64(b, array_join(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)), ",")))

  /** Estimated Jaccard from two equal-length minhash signatures. */
  def minhashJaccard(a: Column, b: Column): Column =
    size(filter(zip_with(a, b, (x, y) => x === y), m => m)).cast("double") /
      size(a).cast("double")

  /** Exact Jaccard over two shingle arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      greatest(size(array_union(a, b)).cast("double"), lit(1.0))

  /** Exact dedup: one surviving row per canonical fingerprint (smallest id
    * wins — deterministic). Returns survivors with `dup_count`.
    */
  def dedupExact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val fp = fingerprintMd5(col(textCol))
    df.withColumn("_fp", fp)
      .groupBy(col("_fp"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("dup_count"))
      .drop("_fp")
  }

  /** Drop LSH buckets larger than `maxBucket` before the self-join: one
    * degenerate bucket (boilerplate-heavy corpora hash identical headers to
    * the same band value) otherwise goes quadratic. Dropped buckets cost
    * recall, never correctness — verify stages re-check survivors exactly.
    * Use [[lshBucketStats]] to SEE what a cap would drop before choosing it.
    */
  private def capBuckets(banded: DataFrame, keys: Seq[String], maxBucket: Int): DataFrame =
    if (maxBucket <= 0) banded
    else {
      import org.apache.spark.sql.expressions.Window
      banded.withColumn("_bn", count(lit(1)).over(
        Window.partitionBy(keys.map(col): _*)))
        .where(col("_bn") <= maxBucket).drop("_bn")
    }

  /** MinHash+LSH candidate pairs (idA < idB) verified with exact Jaccard and
    * filtered at `threshold`. `df` must carry (idCol, textCol).
    *
    * Scale shape: the band join carries ONLY (band, bh, id) — document
    * shingles are never shuffled ×bands; they are fetched once per candidate
    * side for the verify join. `maxBucket` bounds degenerate buckets.
    */
  /** Band geometry guard: bands must tile the signature exactly. k/bands
    * with bands > k yields 0-width bands (every band hash a constant — one
    * global bucket, then capBuckets drops it and the result reads as "no
    * near-duplicates"); a non-dividing bands silently ignores signature
    * slots. Both misconfigurations now fail fast.
    */
  private def bandRows(k: Int, bands: Int): Int = {
    require(bands >= 1 && bands <= k && k % bands == 0,
      s"bands ($bands) must divide the signature size k ($k)")
    k / bands
  }

  def minhashNearDupPairs(df: DataFrame, textCol: String, idCol: String,
      k: Int = 32, bands: Int = 8, threshold: Double = 0.7,
      shingleN: Int = 3, maxBucket: Int = 100000): DataFrame = {
    val rows = bandRows(k, bands)
    val toks = tokens(normalized(col(textCol)))
    val d = widen(df)
    // hashed-shingle SETS for the exact-Jaccard verify (same cardinalities
    // as the string shingles — set semantics preserved by the kernel)
    val sh = d.select(col(idCol).as("id"), MinHash64.shingleHashes(toks, shingleN).as("sh"))
    val banded = capBuckets(
      d.select(col(idCol).as("id"),
        posexplode(lshBandHashes(
          MinHash64.signature(toks, shingleN, k), bands, rows))
          .as(Seq("band", "bh"))),
      Seq("band", "bh"), maxBucket)
    val l = banded.select(col("band"), col("bh"), col("id").as("idA"))
    val r = banded.select(col("band"), col("bh"), col("id").as("idB"))
    val candidates = l.join(r, Seq("band", "bh"))
      .where(col("idA") < col("idB"))
      .select("idA", "idB").distinct() // multi-band hits verified once
    candidates
      .join(sh.select(col("id").as("idA"), col("sh").as("shA")), "idA")
      .join(sh.select(col("id").as("idB"), col("sh").as("shB")), "idB")
      .select(col("idA"), col("idB"), jaccard(col("shA"), col("shB")).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** LSH bucket-size distribution (diagnostic for choosing `maxBucket`):
    * (band, bucket hash, size) for every bucket above `minSize`.
    */
  def lshBucketStats(df: DataFrame, textCol: String, idCol: String,
      k: Int = 32, bands: Int = 8, shingleN: Int = 3, minSize: Long = 2): DataFrame = {
    val rows = bandRows(k, bands)
    df.select(col(idCol).as("id"),
      posexplode(lshBandHashes(
        MinHash64.signature(tokens(normalized(col(textCol))), shingleN, k),
        bands, rows)).as(Seq("band", "bh")))
      .groupBy("band", "bh").agg(count(lit(1)).as("n"))
      .where(col("n") >= minSize)
  }

  /** SimHash near-dup pairs: 64-bit signatures banded into `maxHamming + 1`
    * disjoint chunks — by pigeonhole, two signatures within `maxHamming`
    * Hamming distance share at least one untouched chunk, so candidate
    * generation is CERTAIN (round-1 hard-coded 4 bands, silently losing
    * distance-4..8 pairs at the q22 default of 8). Verified by exact Hamming
    * distance; `maxBucket` bounds degenerate chunk buckets.
    *
    * Scale note: wider maxHamming ⇒ narrower chunks ⇒ coarser buckets
    * (bands=9 leaves ~7-bit chunks = 128 buckets/band). For web-scale sweeps
    * keep maxHamming ≤ 3 (16-bit chunks, 65k buckets/band) or move to wider
    * signatures; the cap keeps worst-case cost bounded either way.
    */
  def simhashNearDupPairs(df: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 3, maxBucket: Int = 100000): DataFrame = {
    val bands = maxHamming + 1
    require(bands <= 64, s"maxHamming $maxHamming needs more bands than bits")
    val sigd = widen(df).select(col(idCol).as("id"),
      SimHash.simhash64(tokens(normalized(col(textCol)))).as("sig"))
    // disjoint chunk b covers bits [64b/bands, 64(b+1)/bands)
    val chunks = (0 until bands).map { b =>
      val lo = 64 * b / bands
      val hi = 64 * (b + 1) / bands
      val mask = if (hi - lo >= 64) -1L else (1L << (hi - lo)) - 1L
      shiftright(col("sig"), lo).bitwiseAND(lit(mask))
    }
    val banded = capBuckets(
      sigd.select(col("id"), col("sig"),
        posexplode(array(chunks: _*)).as(Seq("band", "chunk"))),
      Seq("band", "chunk"), maxBucket)
    val l = banded.select(col("band"), col("chunk"), col("id").as("idA"), col("sig").as("sigA"))
    val r = banded.select(col("band"), col("chunk"), col("id").as("idB"), col("sig").as("sigB"))
    l.join(r, Seq("band", "chunk"))
      .where(col("idA") < col("idB"))
      .select(col("idA"), col("idB"),
        bit_count(col("sigA").bitwiseXOR(col("sigB"))).as("hamming"))
      .groupBy("idA", "idB").agg(min("hamming").as("hamming"))
      .where(col("hamming") <= maxHamming)
  }

  /** Benchmark DECONTAMINATION: per training doc, how much of its distinct
    * n-gram set appears anywhere in a benchmark/eval corpus — the test-set
    * leakage filter every pre-training pipeline runs (flag-and-drop docs
    * that would let the model memorize eval answers). Output per train doc:
    * (id, n_grams, n_shared, overlap, contaminated).
    *
    * Scale shape: the benchmark is tiny next to 100 TB of training data, so
    * its distinct-gram set is computed once and BROADCAST — the training
    * side streams through a broadcast-hash semi-join keyed on 8-byte gram
    * hashes (never strings, never doc bodies) with a map-side count; no
    * training-side shuffle at all until the final per-doc aggregation of
    * (id, count) pairs. Gram hashing reuses the one-pass
    * [[MinHash64.shingleHashes]] kernel (per-doc distinct, sorted).
    */
  def decontaminate(train: DataFrame, bench: DataFrame, textCol: String,
      idCol: String, shingleN: Int = 3, flagRatio: Double = 0.5): DataFrame = {
    def sh(df: DataFrame) = df.select(col(idCol).as("id"),
      MinHash64.shingleHashes(tokens(normalized(col(textCol))), shingleN).as("sh"))
    // no widen() here: the training side's value is exactly that it reaches
    // the per-doc aggregation with NO shuffle at all (PlanSpec gate) — the
    // broadcast semi-join + map-side count is the 100 TB shape, and adding a
    // repartition to parallelize a 1-split local scan measurably COSTS more
    // than the single-task hashing saves (0.15 s → 0.27 s at sf0.1)
    val t = sh(train)
    val benchGrams = sh(bench).select(explode(col("sh")).as("h")).distinct()
    val shared = t.select(col("id"), explode(col("sh")).as("h"))
      .join(broadcast(benchGrams), "h")
      .groupBy("id").agg(count(lit(1)).as("n_shared")) // sh is pre-deduped
    t.select(col("id"), size(col("sh")).cast("long").as("n_grams"))
      .join(shared, Seq("id"), "left")
      .withColumn("n_shared", coalesce(col("n_shared"), lit(0L)))
      // gramless docs (empty/whitespace text, or fewer tokens than
      // shingleN) can't leak anything: without the n_grams > 0 guard the
      // comparison degenerates to 0 >= 0 = true (and overlap to 0/0 = NaN)
      // and blank training docs would be dropped as eval contamination
      .withColumn("overlap",
        when(col("n_grams") > 0,
          round(col("n_shared").cast("double") / col("n_grams"), 6))
          .otherwise(lit(0.0)))
      .withColumn("contaminated",
        col("n_grams") > 0 &&
          col("n_shared").cast("double") >= lit(flagRatio) * col("n_grams"))
      .select(col("id").as(idCol), col("n_grams"), col("n_shared"),
        col("overlap"), col("contaminated"))
  }

  /** Exact n-gram Jaccard near-dup pairs (`threshold` must be > 0).
    *
    * Shape: NOT the n² cross join — pairs come from a gram-level equi
    * self-join. Each doc's distinct hashed shingles (one-pass kernel;
    * identical Jaccard values to string shingles — set cardinalities
    * preserved, 64-bit collisions negligible) explode to (gram, id) rows;
    * the self-join on the 8-byte gram counts |A∩B| per pair, and
    * |A∪B| = |A|+|B|−|A∩B| from the per-doc sizes. Only pairs that SHARE a
    * gram are materialized (a zero-overlap pair has jaccard 0 < threshold by
    * definition), so cost is Σ_gram df(gram)² — the document-frequency skew
    * profile — instead of n²·|shingles| array intersections. Values are
    * bit-identical to the intersect/union formulation: the same two integer
    * cardinalities divide in double.
    */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
      threshold: Double = 0.7, shingleN: Int = 3): DataFrame = {
    require(threshold > 0.0,
      s"threshold must be > 0 (zero-overlap pairs are never emitted): $threshold")
    val p = widen(df).select(col(idCol).as("id"),
      MinHash64.shingleHashes(tokens(normalized(col(textCol))), shingleN).as("sh"))
    val sizes = p.select(col("id"), size(col("sh")).as("n"))
    val grams = p.select(col("id"), explode(col("sh")).as("h"))
    val inter = grams.select(col("h"), col("id").as("idA"))
      .join(grams.select(col("h"), col("id").as("idB")), "h")
      .where(col("idA") < col("idB"))
      .groupBy("idA", "idB").agg(count(lit(1)).as("_inter"))
    inter
      .join(sizes.select(col("id").as("idA"), col("n").as("_nA")), "idA")
      .join(sizes.select(col("id").as("idB"), col("n").as("_nB")), "idB")
      .select(col("idA"), col("idB"),
        (col("_inter").cast("double") /
          greatest((col("_nA") + col("_nB") - col("_inter")).cast("double"),
            lit(1.0))).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }
}
