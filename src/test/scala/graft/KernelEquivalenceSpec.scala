package graft

import graft.functions._
import org.apache.spark.sql.functions._

/** Round-6 optimization equivalence gates: every rewrite that replaced an
  * interpreted/HOF formulation with a native kernel or a restructured plan
  * must produce BIT-IDENTICAL values to the formulation it replaced (the
  * DuckDB oracles replay the original float-op orders, so "close" is not
  * good enough).
  */
class KernelEquivalenceSpec extends SparkSpec {
  import spark.implicits._

  private def vecs: Seq[(Long, Seq[Float])] = {
    // deterministic pseudo-random float vectors, incl. negative values
    def v(seed: Long, dim: Int) = (0 until dim).map { d =>
      var h = seed * 0x9e3779b97f4a7c15L + d * 0xbf58476d1ce4e5b9L
      h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
      h = h ^ (h >>> 27)
      ((h >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0).toFloat
    }
    (0L until 40L).map(i => i -> v(i, 24))
  }

  test("LshBuckets kernel == per-table interpreted lshBucket HOF chain") {
    val dim = 24; val nBits = 4; val nTables = 8
    val df = vecs.toDF("id", "vec")
    val kernel = df.select($"id",
      LshBuckets($"vec", dim, nBits, nTables).as("buckets")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val hof = (0 until nTables).map { t =>
      df.select($"id",
        Similarity.lshBucket($"vec", Similarity.hyperplanes(dim, nBits, t)).as("b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    for (id <- kernel.keys; t <- 0 until nTables)
      assert(kernel(id)(t) == hof(t)(id),
        s"bucket mismatch id=$id table=$t: kernel=${kernel(id)(t)} hof=${hof(t)(id)}")
  }

  test("LshBuckets degenerate inputs mirror the HOF null-folding (bucket 0)") {
    val dim = 24
    val bad = Seq(
      (1L, (0 until 10).map(_.toFloat))               // length mismatch → all-zero buckets
    ).toDF("id", "vec")
    val out = bad.select($"id", LshBuckets($"vec", dim, 4, 2).as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(out(1L) == Seq(0L, 0L), s"length mismatch must fold to bucket 0: ${out(1L)}")
    // null ELEMENT folds every bit to 0 exactly like the zip_with null chain
    val withNull = spark.sql(
      "SELECT array(CAST(NULL AS FLOAT), 1.0F, 2.0F) AS vec")
    val k = withNull.select(LshBuckets(col("vec"), 3, 4, 2).as("b"))
      .collect()(0).getSeq[Long](0)
    assert(k == Seq(0L, 0L), s"null element must fold to bucket 0: $k")
  }

  test("CentroidMeanSorted kernel == id-sorted interpreted fold per dimension") {
    val df = vecs.toDF("id", "vec").withColumn("cell", pmod($"id", lit(3)))
    val kernel = df.groupBy("cell")
      .agg(CentroidMeanSorted(collect_list(struct($"id".as("k"), $"vec".as("vec"))))
        .as("m"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // the pre-optimization formulation: posexplode → per-(cell, dim) sorted fold
    val ref = df.select($"cell", $"id", posexplode($"vec").as(Seq("i", "x")))
      .groupBy("cell", "i").agg(
        (aggregate(
          transform(array_sort(collect_list(struct($"id".as("k"), $"x".as("v")))),
            s => s.getField("v").cast("double")),
          lit(0.0d), (acc, v) => acc + v) / count(lit(1))).as("m"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    for (((cell, i), m) <- ref)
      assert(java.lang.Double.doubleToRawLongBits(kernel(cell)(i)) ==
        java.lang.Double.doubleToRawLongBits(m),
        s"mean mismatch cell=$cell dim=$i: kernel=${kernel(cell)(i)} ref=$m")
  }

  test("gram-join ngramJaccardPairs == crossJoin intersect/union formulation") {
    val docs = Seq(
      (0L, "a b c d e f g"), (1L, "a b c d e f g"), (2L, "a b c d e x y"),
      (3L, "p q r s t u v"), (4L, "p q r s t z z2"), (5L, "only two"),
      (6L, "totally unrelated words here indeed")
    ).toDF("doc_id", "text")
    val opt = Dedup.ngramJaccardPairs(docs, "text", "doc_id", threshold = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // pre-optimization reference
    val p = docs.select($"doc_id".as("id"),
      MinHash64.shingleHashes(TextFunctions.tokens(TextFunctions.normalized($"text")), 3).as("sh"))
    val ref = p.select($"id".as("idA"), $"sh".as("shA"))
      .crossJoin(p.select($"id".as("idB"), $"sh".as("shB")))
      .where($"idA" < $"idB")
      .select($"idA", $"idB", Dedup.jaccard($"shA", $"shB").as("j"))
      .where($"j" >= 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(opt.keySet == ref.keySet, s"pair sets differ: ${opt.keySet} vs ${ref.keySet}")
    for ((k, j) <- ref)
      assert(java.lang.Double.doubleToRawLongBits(opt(k)) ==
        java.lang.Double.doubleToRawLongBits(j), s"jaccard mismatch at $k")
  }

  test("widen: widens a narrow relation, leaves a wide one untouched") {
    val narrow = spark.range(100).coalesce(1).toDF("id")
    val widened = Dedup.widen(narrow)
    assert(widened.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
    assert(widened.count() == 100)
    val wide = spark.range(100)
      .repartition(spark.sparkContext.defaultParallelism).toDF("id")
    assert(Dedup.widen(wide) eq wide) // no-op: same DataFrame reference
  }
}
