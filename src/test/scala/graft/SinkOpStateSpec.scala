package graft

import graft.merge.SinkOpState
import graft.rules.{EventTransform, SinkOp}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Structure-level SinkOp application (the reference's keyed-store algebra,
  * redis.go:225-268) — distributed fold vs a sequential in-memory applier,
  * incremental applyBatch associativity, fence, and the value-addressed
  * List retraction semantics.
  */
class SinkOpStateSpec extends SparkSpec {
  import spark.implicits._

  type Op = (String, String, String, String, Double, String, Long)
  private def op(action: String, key: String, ord: Long, value: String = null,
      field: String = null, score: Double = 0.0): Op =
    ("redis", action, key, field, score, value, ord)

  private def toDf(ops: Seq[Op]): DataFrame =
    ops.toDF("target", "action", "key", "field", "score", "value", "ord")

  /** The reference semantics, single-threaded in ord order (the go applier's
    * in-order Consume, service/handler.go:135-194 + redis.go:225-268).
    */
  private def refFold(ops: Seq[Op]): Set[(String, String, String, String,
      String, String, String, Double, Long)] = {
    // identity (structure,key,field,elem) → (value, score, ord); lists keep
    // every surviving push
    val kv = mutable.Map[(String, String), (String, Long)]()          // string
    val hash = mutable.Map[(String, String), (String, Long)]()        // (k,f)
    val set = mutable.Map[(String, String), Long]()                   // (k,v)
    val zset = mutable.Map[(String, String), (Double, Long)]()        // (k,v)
    val list = mutable.Map[String, mutable.ArrayBuffer[(String, Long)]]()
    ops.sortBy(_._7).foreach { case (_, a, k, f, s, v, ord) => a match {
      case "SET" => kv(( "s", k)) = (v, ord)
      case "DEL" => kv.remove(("s", k))
      case "HSET" => hash((k, f)) = (v, ord)
      case "HDEL" => hash.remove((k, f))
      case "SADD" => set((k, v)) = ord
      case "SREM" => set.remove((k, v))
      case "ZADD" => zset((k, v)) = (s, ord)
      case "ZREM" => zset.remove((k, v))
      case "RPUSH" =>
        list.getOrElseUpdate(k, mutable.ArrayBuffer()) += ((v, ord))
      case "LREM" => list.get(k).foreach(b => b.filterInPlace(_._1 != v))
    }}
    val out = mutable.Set[(String, String, String, String, String, String,
      String, Double, Long)]()
    kv.foreach { case ((_, k), (v, o)) =>
      out += (("redis", "string", k, "", "", "", v, 0.0, o)) }
    hash.foreach { case ((k, f), (v, o)) =>
      out += (("redis", "hash", k, f, "", "", v, 0.0, o)) }
    set.foreach { case ((k, v), o) =>
      out += (("redis", "set", k, "", v, "", v, 0.0, o)) }
    zset.foreach { case ((k, v), (s, o)) =>
      out += (("redis", "zset", k, "", v, "", v, s, o)) }
    list.foreach { case (k, b) => b.foreach { case (v, o) =>
      out += (("redis", "list", k, "", v, o.toString, v, 0.0, o)) } }
    out.toSet
  }

  private def rows(df: DataFrame) = df
    .select("target", "structure", "key", "field", "elem", "uid", "value",
      "score", "ord")
    .as[(String, String, String, String, String, String, String, Double, Long)]
    .collect().toSet

  /** Deterministic op soup over a small keyspace: heavy per-key op runs so
    * every LWW/retraction branch actually fires.
    */
  private def soup(n: Int, seed: Int): Seq[Op] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val k = s"k${rnd.nextInt(5)}"
      val v = s"v${rnd.nextInt(3)}"
      val f = s"f${rnd.nextInt(3)}"
      rnd.nextInt(10) match {
        case 0 => op("SET", s"s:$k", i, value = v)
        case 1 => op("DEL", s"s:$k", i)
        case 2 => op("HSET", s"h:$k", i, value = v, field = f)
        case 3 => op("HDEL", s"h:$k", i, field = f)
        case 4 => op("SADD", s"set:$k", i, value = v)
        case 5 => op("SREM", s"set:$k", i, value = v)
        case 6 => op("ZADD", s"z:$k", i, value = v, score = rnd.nextInt(100) / 10.0)
        case 7 => op("ZREM", s"z:$k", i, value = v)
        case 8 => op("RPUSH", s"l:$k", i, value = v)
        case _ => op("LREM", s"l:$k", i, value = v)
      }
    }
  }

  test("fold == sequential reference applier on all five structures") {
    for (seed <- 1 to 3) {
      val ops = soup(800, seed)
      assert(rows(SinkOpState.fold(toDf(ops))) == refFold(ops), s"seed=$seed")
    }
  }

  test("list retraction: LREM is value-addressed, kills ALL earlier pushes, " +
    "later re-pushes survive with order and duplicates preserved") {
    val ops = Seq(
      op("RPUSH", "l:a", 1, value = "x"),
      op("RPUSH", "l:a", 2, value = "x"), // duplicate
      op("RPUSH", "l:a", 3, value = "y"),
      op("LREM", "l:a", 4, value = "x"),  // removes BOTH x's, keeps y
      op("RPUSH", "l:a", 5, value = "x"), // survives (after the LREM)
      op("RPUSH", "l:a", 6, value = "x")) // duplicate survives too
    val got = SinkOpState.fold(toDf(ops))
      .orderBy("ord").select("value", "ord").as[(String, Long)].collect().toSeq
    assert(got == Seq(("y", 3L), ("x", 5L), ("x", 6L)))
  }

  test("update-retraction pair (LREM old + RPUSH new) replaces in place") {
    val ops = Seq(
      op("RPUSH", "l:u", 16, value = "old"),
      op("LREM", "l:u", 32, value = "old"),   // the reference's update shape
      op("RPUSH", "l:u", 33, value = "new"))  // (redis.go:239-247)
    val got = SinkOpState.fold(toDf(ops))
      .select("value", "ord").as[(String, Long)].collect().toSeq
    assert(got == Seq(("new", 33L)))
  }

  test("incremental applyBatch == one-shot fold (associativity), unchanged " +
    "entries produce no churn, replayed epochs are fenced") {
    val ops = soup(1200, seed = 7)
    val t = SinkOpState.createOrLoad(spark,
      tmpDir("sinkop").resolve("state").toString, numBuckets = 4)
    val chunks = ops.grouped(400).toSeq
    chunks.zipWithIndex.foreach { case (c, e) =>
      val r = SinkOpState.applyBatch(t, toDf(c), e)
      assert(!r.skipped)
    }
    assert(rows(t.snapshot()) == refFold(ops))
    // replay of an already-applied epoch: fenced, state unchanged
    val before = rows(t.snapshot())
    assert(SinkOpState.applyBatch(t, toDf(chunks.head), 0).skipped)
    assert(rows(t.snapshot()) == before)
    // next epoch with ONLY no-op changes (re-SET same values): no data churn
    val resets = before.toSeq.filter(_._2 == "string").map { r =>
      op("SET", r._3, r._9, value = r._7) }
    if (resets.nonEmpty) {
      val filesBefore = t.refresh().files.map(_.rows).sum
      SinkOpState.applyBatch(t, toDf(resets), chunks.size.toLong)
      assert(t.refresh().files.map(_.rows).sum == filesBefore,
        "no-change batch must not rewrite state rows")
      assert(rows(t.snapshot()) == before)
    }
  }

  test("runOrdered: stream pos then emission order, cap enforced") {
    val ds = Seq((5L, "a"), (6L, "b")).toDS()
    val t2 = new EventTransform[String] {
      def apply(e: String): Iterator[SinkOp] =
        Iterator(SinkOp("redis", "SET", e, value = e),
          SinkOp("redis", "RPUSH", s"l:$e", value = e))
    }
    val got = EventTransform.runOrdered(ds.map(x => (x._1, x._2)), t2)
      .orderBy("ord").select("action", "ord").as[(String, Long)].collect().toSeq
    assert(got == Seq(("SET", 80L), ("RPUSH", 81L), ("SET", 96L), ("RPUSH", 97L)))
    val over = new EventTransform[String] {
      def apply(e: String): Iterator[SinkOp] =
        Iterator.fill(17)(SinkOp("redis", "SET", e))
    }
    intercept[org.apache.spark.SparkException] {
      EventTransform.runOrdered(ds.map(x => (x._1, x._2)), over).count()
    }
  }

  test("unknown action fails loudly instead of corrupting state") {
    intercept[Exception] {
      SinkOpState.fold(toDf(Seq(op("SEND", "topic", 1, value = "m")))).count()
    }
  }
}
