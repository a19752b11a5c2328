package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`): brute-force
  * cosine top-k as the exact baseline, and two sublinear scale paths —
  * random-hyperplane LSH bucketing and IVF (inverted-file) partitioning.
  *
  * Vector math is `zip_with`/`aggregate` — native Catalyst higher-order
  * functions, no UDFs, no MLlib dependency.
  */
object Similarity {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0d), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** One-pass native kernel (see [[CosineSim]]); bit-identical to the HOF
    * formulation `dot(a,b) / greatest(norm(a)*norm(b), 1e-12)` but ~20×
    * faster (interpreted lambda evaluation eliminated).
    */
  def cosine(a: Column, b: Column): Column = CosineSim(a, b)

  /** Exact brute-force top-k: for every query vector, the k nearest corpus
    * vectors by cosine. Queries are broadcast (small side); the corpus is
    * scanned once — the right baseline shape even at scale.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      qId: String = "q_id", qVec: String = "q_vec",
      cId: String = "c_id", cVec: String = "c_vec"): DataFrame = {
    val joined = corpus.crossJoin(broadcast(queries))
      .where(col(qId) =!= col(cId))
      .withColumn("cosine", cosine(col(qVec), col(cVec)))
    val w = Window.partitionBy(col(qId)).orderBy(col("cosine").desc, col(cId))
    joined.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(qId), col(cId), round(col("cosine"), 6).as("cosine"), col("rank"))
  }

  /** Deterministic pseudo-random hyperplanes for one LSH table: nBits rows ×
    * dim components in [-1, 1), from a splitmix64 stream seeded by
    * (table, bit, component) — stable across JVMs, no RNG state.
    */
  def hyperplanes(dim: Int, nBits: Int, table: Int): Seq[Seq[Double]] =
    (0 until nBits).map { b =>
      (0 until dim).map { d =>
        var h = table.toLong * 0x9e3779b97f4a7c15L + b.toLong * 0xbf58476d1ce4e5b9L +
          d.toLong * 0x94d049bb133111ebL + 0x2545f4914f6cdd1dL
        h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
        h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
        h = h ^ (h >>> 31)
        (h >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
      }
    }

  /** Random-hyperplane LSH bucket id from a plane LITERAL: the expression
    * tree is O(1) in dim and nBits (an array literal + two nested
    * higher-order functions), vs the round-1 formulation that expanded to
    * dim×nBits expression nodes (~12k at dim=768 — codegen blowup).
    * Bucket bit b = sign of <planes(b), vec>.
    */
  def lshBucket(vec: Column, planes: Seq[Seq[Double]]): Column = {
    val pl = typedLit(planes)
    val bits = transform(pl, p =>
      when(aggregate(zip_with(p, vec, (a, b) => a * b.cast("double")),
        lit(0.0d), (acc, v) => acc + v) > 0, lit(1L)).otherwise(lit(0L)))
    aggregate(bits, lit(0L), (acc, b) => acc * 2 + b)
  }

  def lshBucket(vec: Column, dim: Int, nBits: Int, table: Int): Column =
    lshBucket(vec, hyperplanes(dim, nBits, table))

  /** LSH-bucketed ANN top-k with multi-probe: corpus vectors index into one
    * bucket per table; each query probes its own bucket plus (for
    * `probeHamming` = 1) every bucket one sign-flip away — the standard
    * recall multiplier (multi-probe LSH) that avoids paying for more tables.
    * Exact cosine ranks within candidates. Trades recall for turning the n²
    * cross join into per-bucket equi-joins; recall depends on how close the
    * neighbors are (tune nBits/nTables per corpus — see FunctionsSpec's
    * recall gate against the exact top-k).
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, dim: Int,
      nBits: Int = 8, nTables: Int = 2, probeHamming: Int = 1,
      qId: String = "q_id", qVec: String = "q_vec",
      cId: String = "c_id", cVec: String = "c_vec"): DataFrame = {
    require(probeHamming <= 1,
      s"probeHamming > 1 is not implemented (only 0 or 1-bit-flip probes); got $probeHamming")
    // ONE scan per side, all tables in one native pass ([[LshBuckets]] —
    // value-identical to the per-table lshBucket HOF chain, which cost
    // nTables × nBits × dim interpreted lambda evaluations per row AND
    // re-scanned the input once per table through the union). A null vector
    // indexes nowhere (posexplode of null) instead of into bucket 0 — it
    // could never score anyway (cosine(null, ·) is null).
    def bucketed(df: DataFrame, vecCol: String) =
      df.select(col("*"),
        posexplode(LshBuckets(col(vecCol), dim, nBits, nTables))
          .as(Seq("tbl", "bucket")))
    val cb = bucketed(corpus, cVec)
    val qb0 = bucketed(queries, qVec)
    val qb =
      if (probeHamming <= 0) qb0
      else {
        // probe masks: bucket itself + one-bit flips (bucket bit b has
        // place value 2^(nBits-1-b) under the fold in lshBucket)
        val masks = typedLit(0L +: (0 until nBits).map(b => 1L << b))
        qb0.select(col("*"),
          explode(transform(masks, m => col("bucket").bitwiseXOR(m))).as("probe"))
          .drop("bucket").withColumnRenamed("probe", "bucket")
      }
    // candidate dedup on IDS ONLY — a (table × probe) duplicate candidate
    // must not drag two dim-sized vectors through the distinct exchange
    // (the same id-only discipline as the minhash band join); vectors are
    // re-attached ONCE per surviving pair for scoring
    val cand = qb.join(cb, Seq("tbl", "bucket"))
      .where(col(qId) =!= col(cId))
      .select(col(qId), col(cId)).distinct()
    val scored = cand
      .join(queries.select(col(qId), col(qVec)), Seq(qId))
      .join(corpus.select(col(cId), col(cVec)), Seq(cId))
      .withColumn("cosine", cosine(col(qVec), col(cVec)))
    val w = Window.partitionBy(col(qId)).orderBy(col("cosine").desc, col(cId))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(qId), col(cId), round(col("cosine"), 6).as("cosine"), col("rank"))
  }

  /** IVF (inverted file) ANN: centroids seeded from a deterministic corpus
    * sample, then refined with `trainIters` Lloyd iterations (assign →
    * element-wise mean — the standard IVF coarse-quantizer training; run it
    * on a corpus sample at 10^10-vector scale). Corpus vectors index into
    * their `corpusAssign` nearest cells (multi-assignment: boundary vectors
    * land in every cell that might probe them, at `corpusAssign`× index
    * size — the standard recall lever for weakly-clustered corpora); queries
    * probe their `nProbe` nearest cells only.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nCells: Int = 16, nProbe: Int = 4, trainIters: Int = 2,
      corpusAssign: Int = 1, trainFraction: Double = 1.0,
      deterministic: Boolean = false,
      qId: String = "q_id", qVec: String = "q_vec",
      cId: String = "c_id", cVec: String = "c_vec"): DataFrame = {
    // Lloyd trains on a deterministic hash-sample of the corpus:
    // `trainFraction` < 1 is the 10^10-scale knob (coarse quantizers
    // converge on a sample; a full-corpus assign per iteration would scan
    // 100 TB × trainIters just to place ~nCells centroids)
    val trainSet =
      if (trainFraction >= 1.0) corpus
      else corpus.where(
        pmod(xxhash64(col(cId)), lit(1000000L)) < lit((trainFraction * 1000000L).toLong))
    // Centroid seeding. Default: smallest id per xxhash64 stripe. With
    // `deterministic`, the nCells SMALLEST ids (cell = rank): equally
    // arbitrary as a seed (Lloyd refinement does the real work) but — unlike
    // xxhash64 — reproducible in an external SQL engine, which is what lets
    // the whole index have a DuckDB oracle (q29). Same knob switches the
    // Lloyd mean to an id-SORTED sequential fold: `avg` sums in partition
    // order, so its low-order float bits vary run to run; the sorted fold
    // fixes one IEEE-754 addition order an oracle can replay. Cost: the
    // fold materializes each (cell, dim) value list — fine for a coarse
    // quantizer trained on a (sampled) set, not for general aggregation.
    var cents =
      if (deterministic)
        trainSet.orderBy(col(cId)).limit(nCells)
          .select((row_number().over(Window.orderBy(col(cId))) - 1).as("cell"),
            col(cVec).as("cent_vec"))
      else trainSet
        .withColumn("_stripe", pmod(xxhash64(col(cId)), lit(nCells)))
        .withColumn("_rn", row_number().over(
          Window.partitionBy(col("_stripe")).orderBy(col(cId))))
        .where(col("_rn") === 1)
        .select(col("_stripe").as("cell"), col(cVec).as("cent_vec"))
    // Lloyd refinement: nearest-cell assign, then element-wise mean per cell.
    // Assignment is ONE map-side-combined aggregation, not a window: the
    // argmax cell under (cosine desc, cell asc) is `max_by` over the
    // lexicographic (d, -cell) order — same winner as the previous
    // row_number formulation (ties impossible: -cell is distinct), without
    // the full 16×n-row shuffle+sort a window pays (the broadcast cross
    // join leaves all of a vector's cell rows in one partition, so the
    // partial agg collapses them to one row before the exchange).
    (0 until trainIters).foreach { _ =>
      val assigned = trainSet.crossJoin(broadcast(cents))
        .withColumn("_d", cosine(col(cVec), col("cent_vec")))
        .groupBy(col(cId))
        .agg(max_by(struct(col("cell"), col(cVec).as("_v")),
          struct(col("_d"), negate(col("cell")))).as("_w"))
        .select(col("_w.cell").as("cell"), col(cId), col("_w._v").as(cVec))
      cents =
        if (deterministic)
          // native id-sorted sequential fold per cell ([[CentroidMeanSorted]])
          // — bit-identical to the previous posexplode → per-(cell, dim)
          // sorted-list fold, in one (cell, id, vec)-row aggregation instead
          // of an n×dim-row shuffle + interpreted lambda chain
          assigned.groupBy("cell").agg(
            CentroidMeanSorted(collect_list(
              struct(col(cId).cast("long").as("k"), col(cVec).as("vec"))))
              .as("cent_vec"))
        else assigned
          .select(col("cell"), posexplode(col(cVec)).as(Seq("_i", "_x")))
          .groupBy("cell", "_i").agg(avg("_x").as("_x"))
          .groupBy("cell").agg(
            transform(array_sort(collect_list(struct(col("_i"), col("_x")))),
              s => s.getField("_x")).as("cent_vec"))
    }

    // rank cells PER VECTOR: key on the caller's id column, not a positional
    // guess — with the id anywhere but column 0 a head-column key would rank
    // across unrelated vectors and silently drop most of the corpus from the
    // index. Top-n via sort of the per-vector 16-struct array collected in
    // one map-side-combined agg (same (cosine desc, cell) order and
    // therefore the same selected set as the previous row_number window,
    // minus its shuffle+sort of every (vector × cell) row).
    def assign(df: DataFrame, idCol: String, vecCol: String, n: Int): DataFrame = {
      df.crossJoin(broadcast(cents))
        .withColumn("_d", cosine(col(vecCol), col("cent_vec")))
        .groupBy(col(idCol))
        .agg(slice(array_sort(collect_list(
          struct(negate(col("_d")).as("_nd"), col("cell"), col(vecCol).as("_v")))),
          1, n).as("_top"))
        .select(col(idCol), explode(col("_top")).as("_t"))
        .select(col(idCol), col("_t._v").as(vecCol), col("_t.cell").as("cell"))
    }

    val corpusCells = assign(corpus, cId, cVec, corpusAssign)
    val queryCells = assign(queries, qId, qVec, nProbe)
    // id-only candidate dedup (multi-assigned corpus vectors can meet the
    // same query in several cells); vectors re-attached once for scoring
    val cand = queryCells.join(corpusCells, Seq("cell"))
      .where(col(qId) =!= col(cId))
      .select(col(qId), col(cId)).distinct()
    val scored = cand
      .join(queries.select(col(qId), col(qVec)), Seq(qId))
      .join(corpus.select(col(cId), col(cVec)), Seq(cId))
      .withColumn("cosine", cosine(col(qVec), col(cVec)))
    val w = Window.partitionBy(col(qId)).orderBy(col("cosine").desc, col(cId))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(qId), col(cId), round(col("cosine"), 6).as("cosine"), col("rank"))
  }

  /** Embedding-cosine near-dup pairs (idA < idB, cosine ≥ threshold) —
    * brute force; pair with [[lshBucket]] for the scale path.
    */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    // widen the STREAMED side: the nested-loop join's parallelism equals its
    // left input's partition count, and a small local parquet arrives as one
    // split — n²·dim cosine kernels on a single task (guide §2.5). No-op
    // whenever the scan is already wide.
    val l = Dedup.widen(df).select(col(idCol).as("idA"), col(vecCol).as("vecA"))
    val r = df.select(col(idCol).as("idB"), col(vecCol).as("vecB"))
    l.crossJoin(r).where(col("idA") < col("idB"))
      .withColumn("cosine", cosine(col("vecA"), col("vecB")))
      .where(col("cosine") >= threshold)
      .select(col("idA"), col("idB"), round(col("cosine"), 6).as("cosine"))
  }
}
