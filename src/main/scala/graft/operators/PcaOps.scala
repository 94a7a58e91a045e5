package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed PCA power iteration over an embedding column — the
  * "dominant direction of the corpus" primitive behind semantic-coverage
  * diagnostics, whitening, and the first split of a spill-tree ANN index.
  *
  * The key scale observation: power iteration never needs the d×d
  * covariance as a materialized object. Each step is
  * x ← Σ_rows v·(vᵀx) — two matvecs expressible as ONE exploded
  * (vec_id, i, q) pass + keyed aggregations:
  *   dot(vec)  = Σ_i q·x_i      (groupBy vec_id, map-side combined)
  *   x'_i      = Σ_vec q·dot    (groupBy i over d groups, map-side combined
  *                               so the d-way skew never funnels raw rows)
  * The d-row vector re-enters the next step through a broadcast join; no
  * driver-side collect, the whole two-step iteration is one Catalyst plan.
  *
  * Determinism: components are quantized to integer milli-units
  * (round(v·1000)) up front, so every sum is exact long arithmetic with no
  * float-order drift; the inter-step rescale is a sign-decomposed
  * truncating division (sign(x)·(|x| div 10^6)) that any SQL engine
  * reproduces (plain `div`/`//` disagree between engines on negative
  * operands — truncation-via-abs does not). Bounds: with |q| ≤ Q, n rows,
  * dim d, step 1 magnitudes reach n·Q²·d (1.3e11 at the bench corpus) and
  * step 2 n·Q·d·(step1 div 10^6) — both far inside long range; at larger
  * n the rescale divisor grows with n to keep the same headroom.
  */
object PcaOps {

  // integer `div` (not float `/` + floor: double division can round across
  // an integer boundary at large magnitudes); sign via abs so trunc == floor
  // in every engine
  private def truncDiv(colName: String, k: Long): Column =
    expr(s"(CASE WHEN $colName < 0 THEN -1 ELSE 1 END) * (abs($colName) div $k)")

  /** Two power-iteration steps from x₀ = 1⃗ over the uncentered second
    * moment of the quantized embeddings. Returns one row per dimension:
    * (i, c1, c2) — i 1-based, c1 the first-step vector (exact integer),
    * c2 the second-step vector computed from the rescaled c1.
    */
  def powerIteration2(emb: DataFrame, vecCol: String,
                      rescale: Long = 1000000L): DataFrame = {
    val e = emb.select(col("vec_id"),
        posexplode(col(vecCol)).as(Seq("i0", "x")))
      .select(col("vec_id"), (col("i0") + 1).as("i"),
        round(col("x").cast("double") * 1000, 0).cast("long").as("q"))
    val d1 = e.groupBy("vec_id").agg(sum(col("q")).as("dot1"))
    val r1 = e.join(d1, Seq("vec_id"))
      .groupBy("i").agg(sum(col("q") * col("dot1")).as("c1"))
    val r1s = r1.select(col("i").as("ri"), truncDiv("c1", rescale).as("s1"))
    val d2 = e.join(broadcast(r1s), col("i") === col("ri"))
      .groupBy("vec_id").agg(sum(col("q") * col("s1")).as("dot2"))
    val r2 = e.join(d2, Seq("vec_id"))
      .groupBy("i").agg(sum(col("q") * col("dot2")).as("c2"))
    r1.join(r2, Seq("i"))
  }
}
