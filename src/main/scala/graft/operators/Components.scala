package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the step that
  * turns a near-duplicate PAIR list (minhash/simhash/embedding output)
  * into keep/drop decisions: duplicates are transitive (A≈B, B≈C ⇒
  * one cluster), so per-pair dropping under- or over-deletes.
  *
  * Algorithm: iterative min-label propagation (the Pregel shape GraphX
  * uses, expressed as DataFrame joins). Each iteration sends every
  * node's current label to its neighbors and keeps the minimum —
  * after diameter(G) iterations every node carries the smallest node
  * id of its component. Near-dup graphs are forests of tight cliques,
  * so the diameter is small; `maxIter` bounds the loop and a
  * driver-side convergence check stops early (one count() action per
  * iteration — the standard price of an iterative fixpoint, identical
  * to GraphX/GraphFrames).
  *
  * Scale shape per iteration: one shuffle of the edge list keyed on
  * node id + one aggregation; labels carry (node, label) only. No
  * collect of nodes or edges.
  */
object Components {

  /** (node, component) for every node present in `edges`; component =
    * min node id reachable. Node ids must be orderable (long/string).
    *
    * Contract: convergence needs diameter(G) iterations; if `maxIter`
    * is hit first (a path-shaped graph longer than maxIter — not a
    * near-dup clique forest), the returned labels are the partial
    * fixpoint. Size maxIter to the worst diameter you accept. The
    * returned frame is cached (it closed the iteration); callers may
    * `unpersist()` it when done. */
  def connected(edges: DataFrame, srcCol: String, dstCol: String,
                maxIter: Int = 20): DataFrame = {
    // undirected: keep each edge both ways; self-loops are harmless
    val e = edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
      .unionByName(edges.select(col(dstCol).as("u"), col(srcCol).as("v")))
      .distinct()
      .cache()
    // init fused with the first propagation round: one aggregation
    // gives label = min(self, neighbors) — a clique graph (the common
    // near-dup shape) converges after a single loop check.
    var labels = e.groupBy(col("u").as("node"))
      .agg(min(col("v")).as("nbr"))
      .select(col("node"), least(col("node"), col("nbr")).as("label"))
      .cache()
    var converged = false
    var it = 1
    while (!converged && it < maxIter) {
      // min label among each node's neighbors (messages); the changed
      // flag rides on `next` so convergence costs no extra join
      val msgs = e.join(labels.select(col("node").as("v"), col("label")), "v")
        .groupBy(col("u").as("node"))
        .agg(min(col("label")).as("nbr"))
      val next = labels.join(msgs, Seq("node"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("nbr"), col("label"))).as("label"),
          (coalesce(col("nbr"), col("label")) < col("label")).as("__chg"))
        .cache()
      val changed = next.filter(col("__chg")).count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      it += 1
    }
    e.unpersist()
    labels.select(col("node"), col("label").as("component"))
  }
}
