package graft.operators

import org.apache.spark.sql.DataFrame

/** Shared helpers for the iterative operators (label propagation,
  * PageRank): one lineage-cut policy and one teleport-constant
  * convention, so the two cannot drift apart per call site. */
private[graft] object Iterative {

  /** Cut an iterated plan's lineage: durable `checkpoint` when the context
    * has a checkpoint dir (the cluster-scale mode — survives executor
    * loss), else `localCheckpoint` (keeps local/test paths
    * dependency-free at the cost of restart-on-loss). Without a periodic
    * cut a self-referential plan doubles per iteration and a 100-iteration
    * convergence run OOMs the driver on plan bytes alone. */
  def cutLineage(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint(true)
    else df.localCheckpoint(true)

  /** Teleport constant from the DECIMAL string of (1 − damping), not IEEE
    * subtraction: `1.0 - 0.85` rounds to 0.15000000000000002 while an
    * engine parsing the literal "0.15" gets 0.1499…944 — one ulp apart,
    * which an exact hash compare on quantized ranks cannot absorb. Both
    * engines parse the same decimal literal; both get the same bits. */
  def teleport(damping: Double): Double =
    (BigDecimal(1) - BigDecimal(damping.toString)).toDouble
}
