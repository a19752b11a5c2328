package graft

import graft.functions.Packing

/** Distributed sequence packing (q43): the sharded two-pass prefix sum must
  * equal the single-pass definition for every shard count.
  */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (10L, 100L), (11L, 2000L), (12L, 50L), (13L, 1L), (20L, 0L),
    (21L, 4096L), (35L, 7L), (36L, 2041L), (40L, 3L), (99L, 500L))

  private def packed(nShards: Int): Seq[(Long, Long, Long, Long, Long)] =
    Packing.packSequences(docs.toDF("doc_id", "n_tokens"),
      "doc_id", "n_tokens", seqTokens = 2048L, nShards = nShards)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq

  test("prefix sums, sequence ids and offsets match the scalar definition") {
    // scalar reference: running total in doc_id order
    val expected = docs.sortBy(_._1)
      .scanLeft((0L, 0L, 0L)) { case ((_, _, acc), (id, n)) => (id, n, acc + n) }
      .drop(1)
      .map { case (id, n, aft) =>
        val before = aft - n
        (id, n, before, before / 2048L, before % 2048L)
      }
    assert(packed(4) == expected)
    // doc 36 (before = 100+2000+50+1+0+4096+7 = 6254) straddles nothing
    // special; doc 21 starts exactly at offset 2151 % 2048 = 103 into seq 1
    val byId = packed(4).map(r => r._1 -> r).toMap
    assert(byId(21L) == (21L, 4096L, 2151L, 1L, 103L))
  }

  test("result is invariant under the shard count (two-pass == global)") {
    val ref = packed(1)
    for (n <- Seq(2, 3, 7, 10, 256)) assert(packed(n) == ref,
      s"shard count $n changed the packing")
  }

  test("empty corpus and single doc") {
    assert(Packing.packSequences(
      Seq.empty[(Long, Long)].toDF("doc_id", "n_tokens"),
      "doc_id", "n_tokens", 2048L).count() == 0)
    assert(Packing.packSequences(Seq((5L, 9L)).toDF("doc_id", "n_tokens"),
      "doc_id", "n_tokens", 2048L)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq ==
      Seq((5L, 9L, 0L, 0L, 0L)))
  }
}
