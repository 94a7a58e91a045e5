package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.aggregate.GraftCollectTopK
import org.apache.spark.sql.graft.ColumnBridge

/** Grouped top-k as a BOUNDED-HEAP AGGREGATE instead of a
  * `row_number().over(Window.partitionBy(key))` filter.
  *
  * The window form sorts every candidate row of a group inside one
  * partition — a per-query candidate list that scales with the corpus
  * (brute-force kNN, PQ ADC) or a low-cardinality key (top tokens per
  * language) funnels the whole corpus through a handful of sorts. The
  * aggregate form keeps at most k rows per group in each map task
  * (`CollectTopK`'s BoundedPriorityQueue), merges partials, and never
  * materializes or sorts the full candidate list: O(n log k) work,
  * map-side combined, no hot-key partition. This is the same
  * window→aggregate rewrite the ExactSubstr first-occurrence and LSH
  * bucket caps got in earlier rounds.
  *
  * Determinism: callers put the FULL ordering (sort field plus unique
  * tiebreaker, e.g. `struct(-sim, id)`) in the struct's leading fields;
  * lexicographic struct ordering then equals the window's
  * `orderBy(sim.desc, id.asc)` — including ±0.0, because double negation
  * is an order-antisymmetric bijection under `java.lang.Double.compare`.
  * Payload fields trail the ordering fields and never influence order.
  */
object TopK {

  /** The k SMALLEST values of `c` per group, as an ascending array —
    * `posexplode` of the result yields `rank = pos + 1`, identical to
    * `row_number() <= k` over the same total order.
    */
  def bottomK(c: Column, k: Int): Column = {
    require(k >= 1, s"k must be >= 1, got $k")
    ColumnBridge.column(
      GraftCollectTopK(ColumnBridge.expression(c), k, reverse = true)
        .toAggregateExpression())
  }
}
