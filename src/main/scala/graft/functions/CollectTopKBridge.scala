package org.apache.spark.sql.catalyst.expressions.aggregate

import org.apache.spark.sql.catalyst.expressions.Expression

/** Package-local accessor: [[CollectTopK]] is `private[aggregate]`, and it
  * is exactly the bounded-heap grouped top-k this engine needs (each
  * partial keeps at most k rows in a BoundedPriorityQueue, partials merge
  * map-side), so expose a constructor rather than re-implement the
  * aggregate.
  */
object GraftCollectTopK {
  def apply(child: Expression, num: Int, reverse: Boolean): AggregateFunction =
    CollectTopK(child, num, reverse)
}
