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

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / greatest(norm(a) * norm(b), lit(1e-12d))

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

  /** Random-hyperplane LSH bucket id: `nBits` sign bits of dot products with
    * deterministic pseudo-random hyperplanes (seeded per bit/dim via
    * xxhash64 → [-1,1) floats). Vectors in the same bucket are ANN
    * candidates; union over `nTables` independent tables raises recall.
    */
  def lshBucket(vec: Column, dim: Int, nBits: Int = 12, table: Int = 0): Column = {
    val bits = (0 until nBits).map { b =>
      val proj = (0 until dim).map { d =>
        val w = (pmod(xxhash64(lit(table), lit(b), lit(d)), lit(2000001L)).cast("double") -
          lit(1000000.0d)) / lit(1000000.0d)
        element_at(vec, d + 1) * w
      }.reduce(_ + _)
      when(proj > 0, lit(1L << b)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a + b)
  }

  /** LSH-bucketed ANN top-k: candidates share a bucket in at least one of
    * `nTables` tables; exact cosine rank within candidates. Trades recall
    * for turning the n² cross join into per-bucket equi-joins.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, dim: Int,
      nBits: Int = 8, nTables: Int = 2,
      qId: String = "q_id", qVec: String = "q_vec",
      cId: String = "c_id", cVec: String = "c_vec"): DataFrame = {
    def bucketed(df: DataFrame, vecCol: String) =
      (0 until nTables).map { t =>
        df.select(col("*"), lit(t).as("tbl"), lshBucket(col(vecCol), dim, nBits, t).as("bucket"))
      }.reduce(_ unionAll _)
    val qb = bucketed(queries, qVec)
    val cb = bucketed(corpus, cVec)
    val cand = qb.join(cb, Seq("tbl", "bucket"))
      .where(col(qId) =!= col(cId))
      .select(col(qId), col(cId), col(qVec), col(cVec)).distinct()
      .withColumn("cosine", cosine(col(qVec), col(cVec)))
    val w = Window.partitionBy(col(qId)).orderBy(col("cosine").desc, col(cId))
    cand.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(qId), col(cId), round(col("cosine"), 6).as("cosine"), col("rank"))
  }

  /** IVF (inverted file) ANN: centroids = a deterministic corpus sample;
    * every corpus vector is assigned to its nearest centroid (one broadcast
    * join + argmax, no iterations — "IVF-flat with sampled centroids");
    * queries probe their `nProbe` nearest centroid cells only.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nCells: Int = 16, nProbe: Int = 4,
      qId: String = "q_id", qVec: String = "q_vec",
      cId: String = "c_id", cVec: String = "c_vec"): DataFrame = {
    // deterministic centroid sample: smallest ids, one per hash stripe
    val cents = corpus
      .withColumn("_stripe", pmod(xxhash64(col(cId)), lit(nCells)))
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("_stripe")).orderBy(col(cId))))
      .where(col("_rn") === 1)
      .select(col("_stripe").as("cell"), col(cVec).as("cent_vec"))

    def assign(df: DataFrame, vecCol: String, n: Int): DataFrame = {
      df.crossJoin(broadcast(cents))
        .withColumn("_d", cosine(col(vecCol), col("cent_vec")))
        .withColumn("_r", row_number().over(
          Window.partitionBy(col(df.columns.head)).orderBy(col("_d").desc, col("cell"))))
        .where(col("_r") <= n)
        .drop("cent_vec", "_d", "_r")
    }

    val corpusCells = assign(corpus, cVec, 1)
    val queryCells = assign(queries, qVec, nProbe)
    val cand = queryCells.join(corpusCells, Seq("cell"))
      .where(col(qId) =!= col(cId))
      .select(col(qId), col(cId), col(qVec), col(cVec)).distinct()
      .withColumn("cosine", cosine(col(qVec), col(cVec)))
    val w = Window.partitionBy(col(qId)).orderBy(col("cosine").desc, col(cId))
    cand.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(qId), col(cId), round(col("cosine"), 6).as("cosine"), col("rank"))
  }

  /** Embedding-cosine near-dup pairs (idA < idB, cosine ≥ threshold) —
    * brute force; pair with [[lshBucket]] for the scale path.
    */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val l = df.select(col(idCol).as("idA"), col(vecCol).as("vecA"))
    val r = df.select(col(idCol).as("idB"), col(vecCol).as("vecB"))
    l.crossJoin(r).where(col("idA") < col("idB"))
      .withColumn("cosine", cosine(col("vecA"), col("vecB")))
      .where(col("cosine") >= threshold)
      .select(col("idA"), col("idB"), round(col("cosine"), 6).as("cosine"))
  }
}
