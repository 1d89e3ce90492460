package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list, by iterative
  * min-label propagation: every node's label converges to the minimum node
  * id reachable from it, which identifies its component.
  *
  * This is the cluster-resolution step behind document deduplication at
  * scale: near-dup PAIRS (from MinHash-LSH / SimHash / n-gram Jaccard,
  * `operators/Dedup`) must be folded into CLUSTERS so one canonical
  * document per cluster survives. The reference only ever drops exact
  * duplicates (ops/data_ingestion_ops.py:197); pair→cluster resolution is
  * a beyond-reference training-data operator.
  *
  * Execution shape: each round is one aggregation shuffle (min label over
  * neighbors) + one join; rounds needed = eccentricity of the min-id node
  * (≤ component diameter). Near-dup clusters are small and shallow, so
  * this converges in a handful of rounds even on 100 TB corpora. Lineage
  * is truncated per round with `localCheckpoint` so plans don't grow
  * exponentially (on a cluster, prefer `checkpoint` to HDFS for fault
  * tolerance across long chains).
  */
object Graph {

  /** @param nodes  one column `idCol` — every node, including isolated ones
    * @param edges  undirected pairs (srcCol, dstCol); direction ignored
    * @return (id, comp) — comp = min node id in the component
    */
  def connectedComponents(
      nodes: DataFrame,
      edges: DataFrame,
      idCol: String,
      srcCol: String,
      dstCol: String,
      maxIter: Int = 25
  ): DataFrame = {
    val sym = edges
      .select(col(srcCol).as("a"), col(dstCol).as("b"))
      .unionByName(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .distinct()
      .localCheckpoint(true) // materialize the (possibly expensive) edge source ONCE

    // Iterate ONLY over edge-touched nodes: in a dedup workload the
    // overwhelming majority of documents have no near-dup edge at all —
    // they are their own component by definition and never need to enter
    // the loop. This keeps every round's shuffle proportional to the edge
    // subgraph, not the corpus.
    var labels = sym
      .select(col("a").as("id"))
      .distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint(true)

    import org.apache.spark.sql.graftbridge.CheckpointBridge.backingRdd
    // each round's eager checkpoint supersedes the previous round's blocks;
    // release them deterministically rather than waiting for the
    // ContextCleaner to notice the GC'd Dataset (a long bench/driver
    // session would otherwise accumulate one block set per round per run)
    // prevCp is always the checkpointed frame whose blocks back `labels`
    // (labels itself may be a projection over it); the final round's
    // checkpoint must stay persisted — the returned frame reads from it
    // and a local checkpoint cannot be recomputed.
    var prevCp: DataFrame = labels
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // min label over each node's neighborhood
      val neighborMin = sym
        .join(labels, sym("b") === labels("id"))
        .groupBy(col("a"))
        .agg(min("comp").as("ncomp"))
      val updated = labels
        .join(neighborMin, labels("id") === neighborMin("a"), "left")
        .select(
          col("id"),
          least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("comp"),
          (col("ncomp") < col("comp")).as("_changed")
        )
        .localCheckpoint(true)
      converged = updated.filter(col("_changed")).limit(1).count() == 0
      backingRdd(prevCp).foreach(_.unpersist(false))
      prevCp = updated
      labels = updated.drop("_changed")
      iter += 1
    }
    backingRdd(sym).foreach(_.unpersist(false))

    val isolated = nodes
      .select(col(idCol).as("id"))
      .distinct()
      .join(labels.select("id"), Seq("id"), "left_anti")
      .withColumn("comp", col("id"))
    labels.unionByName(isolated)
  }

  /** Canonical-document selection: one keeper per component, largest
    * `weightCol` first, ties broken by smallest id — the "keep the longest
    * document in each near-dup cluster" policy. */
  def keepersByWeight(
      components: DataFrame, // (id, comp)
      docs: DataFrame,
      idCol: String,
      weightCol: String
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val joined = components.join(docs.select(col(idCol).as("id"), col(weightCol)), Seq("id"))
    val w = Window.partitionBy("comp").orderBy(col(weightCol).desc, col("id"))
    joined
      .select(
        col("comp").as("cluster_id"),
        col("id"),
        row_number().over(w).as("_rn"),
        count(lit(1)).over(Window.partitionBy("comp")).as("cluster_size")
      )
      .filter(col("_rn") === 1)
      .select(col("cluster_id"), col("id").as("keep_doc_id"), col("cluster_size"))
  }
}
