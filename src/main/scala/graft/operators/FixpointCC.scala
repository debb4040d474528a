package graft.operators

import java.math.BigDecimal

import graft.Checkpoints
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Connected components via pointer-jumping min-label, run to a
  * DATA-DRIVEN fixpoint — the convergence-checked twin of q294's
  * fixed four-round unroll.
  *
  * The fixed-round discipline (q66/q94/q294) is exactly replayable by
  * an unrolled oracle, but its round count is a fixture property: on
  * an unknown-diameter production graph a 3-round unroll silently
  * under-converges — nodes beyond the covered propagation distance
  * keep a non-minimal label and NOTHING fails. This operator instead
  * loops the same pointer-jump round (self label ∪ label-of-label ∪
  * neighbor labels → per-node MIN) until a round changes no label,
  * and reports how many EFFECTIVE (label-changing) rounds ran.
  *
  * Convergence detection costs one ONE-ROW aggregate per round, no
  * join: per-node labels are monotonically non-increasing (the MIN
  * always includes the node's own previous label), so Σ lbl strictly
  * decreases exactly when any label changes — an unchanged
  * DECIMAL(38,0) sum IS the fixpoint certificate. (A BIGINT sum could
  * overflow at 10^12 nodes × 10^12 ids; DECIMAL(38,0) cannot.)
  *
  * Scale shape per round — identical to q294's, PlanSpec-pinned
  * there: two keyed shuffle_hash joins (the label table is
  * VERTEX-sized, never broadcast: a Spark broadcast collects to the
  * driver, the 100× OOM) + one min aggregate; the edge side stays on
  * its bucketed layout, exchange-free. Pointer jumping doubles the
  * propagation distance per round, so rounds = O(log diameter): the
  * driver-side loop issues O(log d) tiny actions, the only serial
  * dimension — the GraphX/Pregel superstep schedule. Every round's
  * state is materialized (the 2^k lineage-re-execution trap), and the
  * loop throws rather than spin past `maxRounds` (64 covers any
  * diameter below 2^64 — hitting it means the recurrence broke, not
  * the data).
  *
  * Oracle replay: labels-with-round-index rows (d, node, lbl) make
  * every round "new" under recursive-CTE UNION dedup, so the working
  * table is the full previous round and DuckDB replays the exact
  * recurrence; an EXISTS(change) guard stops emission at the
  * fixpoint, and MAX(d) is the same effective-round count this loop
  * returns (q309's SQL in queries/Graph.scala).
  */
object FixpointCC {

  /** Failsafe ceiling on pointer-jump rounds (≥ log2 of any diameter
    * that fits in a BIGINT id space). */
  val MaxRounds = 64

  /** One pointer-jump round: per node, MIN over its own label, its
    * label's label (the doubling jump), and its in-neighbors' labels.
    * `edges` must be symmetric for undirected components (the trading
    * layout stores both directions). */
  def step(edges: DataFrame, l: DataFrame): DataFrame = {
    val self = l.select(col("node"), col("lbl"))
    val jump = l.alias("a")
      .join(l.alias("b").hint("shuffle_hash"), col("a.lbl") === col("b.node"))
      .select(col("a.node").as("node"), col("b.lbl").as("lbl"))
    val nbr = edges.join(l.hint("shuffle_hash"), col("node") === col("src"))
      .select(col("dst").as("node"), col("lbl"))
    self.unionByName(jump).unionByName(nbr)
      .groupBy("node").agg(min(col("lbl")).as("lbl"))
  }

  /** Fixed-round unroll of [[step]] — q294's discipline, exposed so
    * CcFixpointSpec can demonstrate the under-convergence a bounded
    * unroll hides on a long-diameter graph. */
  def bounded(edges: DataFrame, rounds: Int): DataFrame = {
    val l0 = init(edges)
    (1 to rounds).foldLeft(Checkpoints.materialize(l0)) { (l, k) =>
      if (k < rounds) Checkpoints.materialize(step(edges, l))
      else step(edges, l)
    }
  }

  /** Runs [[step]] to fixpoint. Returns (labels `(node, lbl)`,
    * effective rounds run — rounds that changed at least one label;
    * the loop executes one extra confirming round that is not
    * counted, matching the oracle's MAX(d)). */
  def run(edges: DataFrame, maxRounds: Int = MaxRounds): (DataFrame, Long) = {
    var cur = Checkpoints.materialize(init(edges))
    var curSum = lblSum(cur)
    var rounds = 0L
    var converged = false
    while (!converged) {
      if (rounds >= maxRounds)
        throw new IllegalStateException(
          s"FixpointCC did not converge within $maxRounds pointer-jump rounds")
      val nxt = Checkpoints.materialize(step(edges, cur))
      val nxtSum = lblSum(nxt)
      if (nxtSum.compareTo(curSum) == 0) converged = true
      else { cur = nxt; curSum = nxtSum; rounds += 1 }
    }
    (cur, rounds)
  }

  /** Every node labeled with its own id. Symmetric edges ⇒ the src
    * column alone covers the node set. */
  private def init(edges: DataFrame): DataFrame =
    edges.select(col("src").as("node")).distinct()
      .withColumn("lbl", col("node"))

  /** Monotone convergence certificate: exact Σ lbl. Null (empty
    * graph) canonicalizes to 0. */
  private def lblSum(l: DataFrame): BigDecimal = {
    val v = l.agg(sum(col("lbl").cast(DecimalType(38, 0)))).head.getDecimal(0)
    if (v == null) BigDecimal.ZERO else v
  }
}
