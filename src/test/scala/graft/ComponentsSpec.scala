package graft

import graft.functions.Components
import org.scalatest.funsuite.AnyFunSuite

/** Connected-components cluster resolution (q41). */
class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def cc(verts: Seq[String], edges: Seq[(String, String)]): Map[String, String] =
    Components.connectedComponents(
      verts.toDF("id"), edges.toDF("idA", "idB"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  test("chain, triangle, and singletons resolve to min-id components") {
    val verts = Seq("a", "b", "c", "d", "e", "f", "g", "h")
    // chain a-b-c-d (diameter 3), triangle e-f-g, singleton h
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"),
      ("e", "f"), ("f", "g"), ("e", "g"))
    assert(cc(verts, edges) == Map(
      "a" -> "a", "b" -> "a", "c" -> "a", "d" -> "a",
      "e" -> "e", "f" -> "e", "g" -> "e", "h" -> "h"))
  }

  test("duplicate edges, reversed edges and self-loops are tolerated") {
    val verts = Seq("x", "y", "z")
    val edges = Seq(("y", "x"), ("x", "y"), ("x", "x"), ("y", "x"))
    assert(cc(verts, edges) == Map("x" -> "x", "y" -> "x", "z" -> "z"))
  }

  test("no edges: every vertex is its own component") {
    assert(cc(Seq("p", "q"), Nil) == Map("p" -> "p", "q" -> "q"))
  }

  test("maxIters guard fails loudly instead of looping") {
    // a 6-chain needs ~5 propagation rounds; cap at 2
    val verts = (0 to 5).map(i => s"v$i")
    val edges = (0 until 5).map(i => (s"v$i", s"v${i + 1}"))
    intercept[IllegalArgumentException] {
      Components.connectedComponents(
        verts.toDF("id"), edges.toDF("idA", "idB"), maxIters = 2).collect()
    }
  }

  test("dedupClusters on a tiny corpus: transitive near-dups collapse to " +
    "one keeper; distinct docs stay canonical") {
    // three mutual near-identical docs (shared long text, tiny edits) + two
    // unrelated docs
    val base = "the quick brown fox jumps over the lazy dog again and " +
      "again while the storm rolls in across the quiet harbor tonight"
    val docs = Seq(
      ("d1", base),
      ("d2", base + " extra"),
      ("d3", "indeed " + base),
      ("d4", "completely different content about spark catalyst planning " +
        "and shuffle exchanges in distributed aggregation pipelines"),
      ("d5", "a third topic entirely: tide tables, lighthouse keepers, and " +
        "the slow erosion of basalt cliffs under winter waves")
    ).toDF("doc_id", "text")
    val out = Components.dedupClusters(docs, "text", "doc_id", threshold = 0.5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getBoolean(3))).toSet
    assert(out == Set(
      ("d1", "d1", 3L, true), ("d2", "d1", 3L, false), ("d3", "d1", 3L, false),
      ("d4", "d4", 1L, true), ("d5", "d5", 1L, true)))
  }
}
