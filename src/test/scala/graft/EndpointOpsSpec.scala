package graft

import graft.changelog.MySqlDecode
import graft.core.Types
import graft.lake.LakeTable
import graft.merge.MergeInto
import graft.sources.PointLookup
import graft.streaming.MetricsServer
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Endpoint-adjacent operators: MySQL ENUM/SET/BIT decode (P5 completion),
  * per-row point-lookup enrichment (S8 escape hatch), live metrics endpoint
  * (C5 analog).
  */
class EndpointOpsSpec extends SparkSpec {
  import spark.implicits._

  test("ENUM/SET/BIT decode matches the reference's convertColumnData semantics") {
    val labels = Seq("red", "green", "blue")
    val df = Seq[java.lang.Long](null, 0L, 1L, 3L, 4L).toDF("v")
    val enums = df.select(MySqlDecode.decodeEnum($"v", labels)).as[String].collect().toSeq
    // null passes; 0 (MySQL invalid-enum sentinel) and out-of-range → ""
    assert(enums == Seq(null, "", "red", "blue", ""))

    val sets = df.select(MySqlDecode.decodeSet($"v", Seq("a", "b", "c")))
      .as[String].collect().toSeq
    assert(sets == Seq(null, "", "a", "a,b", "c"))

    val bits = Seq(("n", null.asInstanceOf[java.lang.Long]), ("z", 0L: java.lang.Long),
      ("one", 1L: java.lang.Long), ("big", 7L: java.lang.Long))
      .toDF("k", "v").orderBy("k")
    val bitVals = bits.select($"k", MySqlDecode.decodeBit($"v"))
      .as[(String, java.lang.Long)].collect().toMap
    assert(bitVals("n") == null && bitVals("z") == 0L &&
      bitVals("one") == 1L && bitVals("big") == 1L)
    // the reference's string form: "\x01" → 1, anything else → 0
    val strBits = Seq("\u0001", "x").toDF("v")
      .select(MySqlDecode.decodeBit($"v")).as[Long].collect().toSeq
    assert(strBits == Seq(1L, 0L))
  }

  test("PointLookup.enrich: per-partition connector lifecycle + row-level hits") {
    EndpointOpsSpec.opens.set(0)
    EndpointOpsSpec.closes.set(0)
    val ds = spark.range(0, 100).repartition(4).as[Long]
    val out = PointLookup.enrich(ds, () => new EndpointOpsSpec.MapStore)(identity) {
      (k, v) => (k, v.getOrElse("miss"))
    }.collect().toMap
    assert(out(2L) == "even" && out(3L) == "miss")
    assert(out.count(_._2 == "even") == 50)
    // exactly one connector per partition, all closed
    assert(EndpointOpsSpec.opens.get() == 4, s"opens=${EndpointOpsSpec.opens.get()}")
    assert(EndpointOpsSpec.closes.get() == 4, s"closes=${EndpointOpsSpec.closes.get()}")
  }

  test("MetricsServer: /metrics (prometheus) and /status reflect table state") {
    val schema = StructType(Seq(StructField("k", StringType, nullable = false),
      StructField("v", StringType)))
    val t = LakeTable.create(spark, tmpDir("metrics").resolve("t").toString,
      schema, Seq("k"), Seq("k"), 2)
    val batch = Seq(("insert", 1L, "a", "a1"), ("insert", 2L, "b", "b1"))
      .toDF("_op", "_pos", "k", "v")
      .withColumn("_event_ts", lit(null).cast("timestamp"))
    MergeInto.merge(t, batch, 0)
    val srv = new MetricsServer(Map("transcripts" -> t)).start()
    try {
      def get(path: String): String = {
        val url = java.net.URI.create(s"http://127.0.0.1:${srv.boundPort}$path").toURL
        val in = url.openStream()
        try new String(in.readAllBytes(), "UTF-8") finally in.close()
      }
      val prom = get("/metrics")
      assert(prom.contains("""graft_last_offset{table="transcripts"} 2"""))
      assert(prom.contains("""graft_last_epoch{table="transcripts"} 0"""))
      assert(prom.contains("""graft_rows_upserted_total{table="transcripts"} 2"""))
      val status = get("/status")
      assert(status.contains(""""transcripts":{"version":2""") &&
        status.contains(""""lastOffset":2"""))
    } finally srv.stop()
  }
}

object EndpointOpsSpec {
  val opens = new java.util.concurrent.atomic.AtomicInteger(0)
  val closes = new java.util.concurrent.atomic.AtomicInteger(0)

  /** In-memory keyed store standing in for a live KV/DB connector. */
  final class MapStore extends PointLookup[Long, String] {
    override def open(): Unit = { opens.incrementAndGet(); () }
    override def lookup(key: Long): Option[String] =
      if (key % 2 == 0) Some("even") else None
    override def close(): Unit = { closes.incrementAndGet(); () }
  }
}
