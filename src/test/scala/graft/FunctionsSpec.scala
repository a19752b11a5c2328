package graft

import graft.functions._
import org.apache.spark.sql.functions._

/** Training-data operators: text analysis, dedup family, similarity,
  * multimodal plumbing.
  */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy dog"),     // exact dup of 0
    (2L, "The  Quick  Brown Fox jumps over the lazy dog"),   // case/ws dup of 0
    (3L, "the quick brown fox jumps over the sleepy dog"),   // near-dup (1 word)
    (4L, "completely different content about spark engines and shuffles here"),
    (5L, "der schnelle braune fuchs und der faule hund ist nicht da")
  ).toDF("doc_id", "text")

  test("exact dedup groups case/whitespace-normalized duplicates") {
    val survivors = Dedup.dedupExact(docs, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(survivors(0L) == 3)         // 0,1,2 collapse; min id survives
    assert(!survivors.contains(1L) && !survivors.contains(2L))
    assert(survivors(3L) == 1 && survivors(4L) == 1)
  }

  test("minhash LSH finds the near-dup pair and skips unrelated docs") {
    val pairs = Dedup.minhashNearDupPairs(docs, "text", "doc_id",
      k = 32, bands = 16, threshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)) && pairs.contains((0L, 2L)))
    assert(pairs.contains((0L, 3L)) || pairs.contains((1L, 3L)), s"near-dup missed: $pairs")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("minhash jaccard estimate tracks exact jaccard") {
    val d = docs.select($"doc_id", Dedup.shingles($"text", 3).as("sh"))
      .withColumn("sig", Dedup.minhashSignatureRef($"sh", 64))
    val a = d.where($"doc_id" === 0).select("sh", "sig").head()
    val b = d.where($"doc_id" === 3).select("sh", "sig").head()
    val exact = {
      val sa = a.getSeq[String](0).toSet; val sb = b.getSeq[String](0).toSet
      sa.intersect(sb).size.toDouble / sa.union(sb).size
    }
    val est = Seq((a.getSeq[Long](1), b.getSeq[Long](1))).toDF("s1", "s2")
      .select(Dedup.minhashJaccard($"s1", $"s2")).as[Double].head()
    assert(math.abs(est - exact) < 0.25, s"est=$est exact=$exact")
  }

  test("simhash: identical docs → distance 0; near-dups close; unrelated far") {
    val sig = docs.select($"doc_id",
      SimHash.simhash64(TextFunctions.tokens(TextFunctions.normalized($"text"))).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sig(0L), sig(1L)) == 0)
    assert(ham(sig(0L), sig(2L)) == 0) // normalized
    assert(ham(sig(0L), sig(3L)) <= 16)
    assert(ham(sig(0L), sig(4L)) > 16)
    val pairs = Dedup.simhashNearDupPairs(docs, "text", "doc_id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)) && pairs.contains((0L, 2L)))
  }

  test("ngram jaccard exact pairs") {
    val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id", threshold = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs((0L, 1L)) == 1.0)
    assert(pairs.contains((0L, 3L)))
    assert(!pairs.keySet.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("cosine kernel: null on length mismatch, even with non-nullable literal inputs") {
    val df = spark.range(1).select(
      typedlit(Array(1.0f, 2.0f)).as("a"),
      typedlit(Array(1.0f)).as("b"),
      typedlit(Array(3.0f, 4.0f)).as("c"))
    val r = df.select(
      Similarity.cosine($"a", $"b").as("mismatch"),
      Similarity.cosine($"a", $"c").as("ok")).head()
    assert(r.isNullAt(0), "length mismatch must yield null (zip_with parity)")
    assert(math.abs(r.getDouble(1) - (11.0 / (math.sqrt(5.0) * math.sqrt(25.0)))) < 1e-12)
  }

  test("cosine/dot on float vectors; brute-force top-k ranks by cosine") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f)), (3L, Array(-1.0f, 0.0f))).toDF("vec_id", "embedding")
    val cos = vecs.as("a").crossJoin(vecs.as("b"))
      .where($"a.vec_id" === 0 && $"b.vec_id" === 1)
      .select(Similarity.cosine($"a.embedding", $"b.embedding")).as[Double].head()
    assert(math.abs(cos - 0.9 / math.sqrt(0.82)) < 1e-6)
    val q = vecs.where($"vec_id" === 0).select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val c = vecs.select($"vec_id".as("c_id"), $"embedding".as("c_vec"))
    val topk = Similarity.bruteForceTopK(q, c, 3).orderBy("rank")
      .select("c_id").as[Long].collect().toSeq
    assert(topk == Seq(1L, 2L, 3L))
  }

  test("IVF and LSH ANN recall the true nearest neighbor on clustered data") {
    // two tight clusters; the true NN of each query is inside its cluster
    val base = (0 until 50).map { i =>
      val c = if (i % 2 == 0) 1.0f else -1.0f
      (i.toLong, Array(c + i * 1e-4f, c - i * 1e-4f, c, c))
    }
    val vecs = base.toDF("vec_id", "embedding")
    val q = vecs.where($"vec_id" < 2).select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val c = vecs.select($"vec_id".as("c_id"), $"embedding".as("c_vec"))
    val exact = Similarity.bruteForceTopK(q, c, 1)
      .select("q_id", "c_id").as[(Long, Long)].collect().toMap
    val ivf = Similarity.ivfTopK(q, c, 1, nCells = 4, nProbe = 2)
      .select("q_id", "c_id").as[(Long, Long)].collect().toMap
    val lsh = Similarity.lshTopK(q, c, 1, dim = 4, nBits = 4, nTables = 4)
      .select("q_id", "c_id").as[(Long, Long)].collect().toMap
    assert(ivf == exact, s"IVF missed: $ivf vs $exact")
    assert(lsh == exact, s"LSH missed: $lsh vs $exact")
  }

  test("ANN scale paths: LSH and IVF recall@5 >= 0.9 vs exact top-k on real embeddings") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/embeddings.parquet").exists)
    def sets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select($"q_id".cast("long"), $"c_id".cast("long")).as[(Long, Long)]
        .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = sets(QueryCatalog.embAnnTopK(spark, dir))
    def recall(approx: Map[Long, Set[Long]]): Double =
      exact.map { case (q, e) =>
        approx.getOrElse(q, Set.empty[Long]).intersect(e).size.toDouble / e.size
      }.sum / exact.size
    val rLsh = recall(sets(QueryCatalog.embAnnLsh(spark, dir)))
    val rIvf = recall(sets(QueryCatalog.embAnnIvf(spark, dir)))
    assert(rLsh >= 0.9, s"LSH recall@5 = $rLsh")
    assert(rIvf >= 0.9, s"IVF recall@5 = $rIvf")
  }

  test("text stats: token counts, quality features, lang id") {
    val d = Seq((0L, "The quick brown fox! It runs."),
      (1L, "der hund und die katze und das nicht ist ein mit auf"),
      (2L, "这是一个中文句子")).toDF("doc_id", "text")
    val stats = d.select($"doc_id",
      TextFunctions.tokenCount($"text").as("n"),
      TextFunctions.tokenCountBpe($"text").as("bpe"),
      TextFunctions.langId($"text").as("lang")).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getString(3))).toMap
    assert(stats(0L)._1 == 6)
    assert(stats(0L)._2 == 8) // 6 words + '!' + '.'
    assert(stats(0L)._3 == "en")
    assert(stats(1L)._3 == "de")
    assert(stats(2L)._3 == "zh")
    val q = d.where($"doc_id" === 0)
      .select(TextFunctions.qualityFeatures($"text").as("q")).select($"q.*").head()
    assert(q.getAs[Int]("n_chars") == 29)
    assert(q.getAs[Double]("quality") > 0.0 && q.getAs[Double]("quality") <= 1.0)
  }

  test("fingerprints: md5 ws-insensitive; rolling hash stable + content-sensitive") {
    val fp = docs.select($"doc_id", TextFunctions.fingerprintMd5($"text").as("m"),
      TextFunctions.fingerprintRolling($"text").as("r")).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(fp(0L) == fp(1L) && fp(0L) == fp(2L))
    assert(fp(0L)._1 != fp(4L)._1 && fp(0L)._2 != fp(4L)._2)
  }

  test("multimodal: media table schema, batched feature extraction, frame sampling") {
    val media = Multimodal.synthesizeMediaTable(docs, "doc_id", "text")
    assert(media.schema("payload").dataType == org.apache.spark.sql.types.BinaryType)
    val feats = Multimodal.extractFeatures(media, dim = 8).collect()
    assert(feats.length == docs.count())
    val f0 = feats.find(_.media_id == 0L).get
    val f1 = feats.find(_.media_id == 1L).get
    assert(f0.n_bytes == 43)
    assert(f0.feature.toSeq == f1.feature.toSeq) // same payload ⇒ same fake features
    assert(f0.feature.length == 8)
    val frames = Multimodal.sampleFrames(media, everyMs = 60000L)
    // exact content: for every video, frames are 0, 60000, ... ≤ duration,
    // indexed densely from 0 — recomputed independently from the meta
    val durations = media.where($"meta.media_type" === "video")
      .select($"media_id", $"meta.duration_ms").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(durations.nonEmpty)
    val got = frames.collect()
      .map(r => (r.getLong(0), r.getInt(2)) -> (r.getLong(1), r.getLong(3))).toMap
    val expected = durations.flatMap { case (id, dur) =>
      (0L to dur by 60000L).zipWithIndex.map { case (ts, i) => (id, i) -> (dur, ts) }
    }
    assert(got == expected)
  }

  test("decontamination: full copy flagged, partial overlap scored, " +
    "unrelated doc clean") {
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    // t1 = verbatim benchmark copy; t2 = shares the grams spanning
    // "gamma delta epsilon" only; t3 = disjoint
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two gamma delta epsilon nine ten"),
      (3L, "totally unrelated words with no overlap at all"))
      .toDF("doc_id", "text")
    val out = Dedup.decontaminate(train, bench, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(4))).toMap
    // 3-gram counts: t1 has 4 grams, all shared; t2 has 5, exactly one
    // ("gamma delta epsilon") shared; t3 has 6, none shared
    assert(out == Map(
      1L -> (4L, 4L, true),
      2L -> (5L, 1L, false),
      3L -> (6L, 0L, false)))
  }
}
