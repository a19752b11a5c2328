package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected pair list — the cluster-resolution
  * step that turns near-duplicate PAIRS (MinHash/SimHash/embedding, q21/q22/
  * q26) into deduplication DECISIONS: every document labeled with the
  * smallest id reachable through the duplicate relation, so "keep one doc
  * per duplicate cluster" is `where(is_canonical)`. Pairs alone under-delete:
  * A~B and B~C without A~C must still collapse to ONE kept doc, which only
  * the transitive closure gives.
  *
  * Algorithm: min-label propagation. labels start as the vertex id; each
  * round every vertex takes the min of its own label and its neighbors'
  * labels; fixpoint = components. Each round is one equi-join (edges ⋈
  * labels) + one map-side-combined min aggregation — no windows, no
  * cross joins, nothing driver-side except the per-round convergence count.
  *
  * == Scale (10^10 docs, 1000 executors) ==
  * Rounds needed = the largest cluster's DIAMETER, not log |V| — and dup
  * clusters are dense blobs of mutual near-duplicates (diameter 1-3), not
  * long chains, so propagation converges in a handful of rounds where the
  * general-graph O(log²) star-contraction algorithms (Kiveris et al.,
  * "Connected Components in MapReduce", SOCC'14) would pay their constant
  * factors for nothing. The loop runs over edge-incident vertices only, so
  * per round the join shuffles O(|E|) rows of two columns each — the
  * singleton majority of a 10^10-doc corpus never enters the iteration;
  * `localCheckpoint` truncates the plan so round N's lineage
  * does not replay rounds 1..N-1 (the classic iterative-Spark blowup).
  * A `maxIters` guard fails loudly on pathological chain graphs rather
  * than looping; raise it (cost: more rounds) or pre-contract with the
  * star algorithms if a corpus genuinely has chained duplicates.
  */
object Components {

  /** (id, comp) for every vertex: comp = min id in the vertex's component.
    * `vertices` needs column `id`; `edges` columns `idA`/`idB` (undirected,
    * self-loops and duplicates tolerated).
    */
  def connectedComponents(vertices: DataFrame, edges: DataFrame,
      maxIters: Int = 25): DataFrame =
    vertices.select(col("id"))
      .join(componentLabels(edges, maxIters), Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))

  /** Converged (id, comp) labels for EDGE-INCIDENT vertices only — the
    * O(|E|)-sized core of [[connectedComponents]]; the singleton majority
    * never enters (their comp is their own id by definition). Exposed so
    * consumers that can exploit the "unlabeled ⇒ singleton" invariant (e.g.
    * [[dedupClusters]]'s cluster sizes) skip re-deriving per-vertex facts
    * from the full corpus.
    */
  private[functions] def componentLabels(edges: DataFrame,
      maxIters: Int = 25): DataFrame = {
    val sym = edges.select(col("idA").as("src"), col("idB").as("dst"))
      .unionAll(edges.select(col("idB").as("src"), col("idA").as("dst")))
      .where(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint() // compute pair candidates once, not once per round
    // Iterate ONLY over edge-incident vertices: the duplicate graph is
    // sparse (|incident| ≈ 2·|pairs| ≪ |docs|), so every round costs
    // O(|E|), not O(|V|) — at 10^10 docs the loop never touches the
    // overwhelming singleton majority, which joins back in one final pass.
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint()
    var round = 0
    var changed = 1L
    while (changed > 0) {
      round += 1
      require(round <= maxIters,
        s"connectedComponents did not converge in $maxIters rounds — " +
          "chained duplicate clusters deeper than the guard; raise maxIters")
      val msgs = sym.join(labels, sym("src") === labels("id"))
        .select(col("dst").as("id"), col("comp"), lit(false).as("_own"))
      // Convergence detection rides INSIDE the round's one aggregation job:
      // every id carries exactly one label row (msgs go only to edge-incident
      // vertices, all of which are labeled), so tagging it `_own` recovers
      // the previous label as a conditional max in the same groupBy — and an
      // `observe` on the checkpoint materialization counts changed labels for
      // free. The previous formulation paid a second join+shuffle+count JOB
      // per round just to ask "did anything change" (2 jobs/round → 1).
      val obs = new org.apache.spark.sql.Observation(s"cc-round-$round")
      val next = labels.withColumn("_own", lit(true)).unionByName(msgs)
        .groupBy("id").agg(
          min("comp").as("comp"),
          max(when(col("_own"), col("comp"))).as("_prev"))
        .observe(obs,
          sum(when(col("comp") =!= col("_prev"), 1L).otherwise(0L)).as("changed"))
        .select("id", "comp")
        .localCheckpoint()
      changed = obs.get.get("changed").map(_.asInstanceOf[Long]).getOrElse(0L)
      labels = next
    }
    labels
  }

  /** End-to-end dedup cluster resolution over a document table: MinHash-LSH
    * near-dup pairs (q21's scale path) → connected components → per-doc
    * verdict. Output: (doc_id, canonical_id = min doc_id of the cluster,
    * cluster_size, is_canonical); `where(is_canonical)` is the kept corpus.
    */
  def dedupClusters(df: DataFrame, textCol: String, idCol: String,
      k: Int = 32, bands: Int = 16, threshold: Double = 0.6,
      shingleN: Int = 3, maxIters: Int = 25): DataFrame = {
    val pairs = Dedup.minhashNearDupPairs(df, textCol, idCol,
      k = k, bands = bands, threshold = threshold, shingleN = shingleN)
      .select("idA", "idB")
    // Per-cluster facts from the O(|E|)-sized label core only: an unlabeled
    // doc is a singleton (comp = own id, cluster_size = 1) BY CONSTRUCTION,
    // so aggregating sizes over the full corpus — and sort-merge-joining
    // them back across the singleton majority — was pure waste: at 10^10
    // docs that aggregation alone shuffles every doc id once. One small
    // labels⋈sizes join, then a single left attach to the corpus.
    val labels = componentLabels(pairs, maxIters)
    val sizes = labels.groupBy("comp").agg(count(lit(1)).as("cluster_size"))
    df.select(col(idCol).as("id"))
      .join(labels.join(sizes, "comp"), Seq("id"), "left")
      .select(col("id").as("doc_id"),
        coalesce(col("comp"), col("id")).as("canonical_id"),
        coalesce(col("cluster_size"), lit(1L)).as("cluster_size"),
        (col("id") <=> coalesce(col("comp"), col("id"))).as("is_canonical"))
  }
}
