package graft.ops

import graft.{GraftSession, QueryPack}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational core: scans/projection, filters, joins, set ops, top-k.
  *
  * These are the Spark-native surface the reference gets implicitly
  * (SURVEY.md §2.1-§2.3, §2.6-§2.7): xcube's `select_variables_subset`
  * (select.py:66), `select_temporal_subset` (select.py:166), variable union
  * on merge (gen2/local/combiner.py), time-slice insert/dedup
  * (timeslice.py:62-131), `max_valids` trimming
  * (webapi/timeseries/controllers.py:300).
  *
  * Scale notes: dimension joins use explicit `broadcast()`; filters and
  * projections are plain Catalyst ops so parquet pushdown + column pruning
  * apply; the union-dedup shuffles once on the dedup key.
  */
object RelationalPack extends QueryPack {

  private def t(s: SparkSession, d: String, n: String) = GraftSession.table(s, d, n)

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.4-flavored pricing summary: map-side partial agg, one shuffle.
    "q1_agg" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum(col("l_quantity")), 6).as("sum_qty"),
          round(sum(col("l_extendedprice")), 6).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 6).as("sum_disc_price"),
          round(avg(col("l_quantity")), 6).as("avg_qty"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }),

    // select_variables_subset + predicate pushdown: projection reaches the
    // parquet scan (ReadSchema), filter shows up in PushedFilters.
    "q_select_vars" -> ((s, d) => {
      t(s, d, "part")
        .select("p_partkey", "p_brand", "p_retailprice")
        .filter(col("p_retailprice") > 910.0)
    }),

    // select_temporal_subset semantics: [t1, t2 + 1 day) with end rounded up
    // one day (select.py:197-204).
    "q_temporal_subset" -> ((s, d) => {
      GraftSession.events(s, d)
        .filter(col("ts") >= lit("2024-01-03").cast("timestamp") &&
                col("ts") < lit("2024-01-05").cast("timestamp") + expr("INTERVAL 1 DAY"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 6).as("sum_value"))
    }),

    // top-k with deterministic tiebreak (§2.6 max_valids trimming analog).
    "q_topk" -> ((s, d) => {
      t(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    }),

    // fact ⋈ broadcast dims: revenue per market segment.
    "q_join_pricing" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val o = t(s, d, "orders")
      val c = t(s, d, "customer")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 6).as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // TPC-H Q5-shaped STAR join: fact ⋈ fact (the one real shuffle) with
    // the whole dimension chain broadcast — customer and supplier must
    // come from the same nation, nations filtered through region. The
    // 1000-executor shape: one shuffle on orderkey, everything else
    // BroadcastHashJoin; Catalyst/AQE pick the join order.
    "q_star_join" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val o = t(s, d, "orders")
      val c = t(s, d, "customer")
      val su = t(s, d, "supplier")
      val n = t(s, d, "nation")
      val r = t(s, d, "region").filter(col("r_regionkey") < 3)
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(su), li("l_suppkey") === su("s_suppkey") &&
          c("c_nationkey") === su("s_nationkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy("n_name")
        .agg(round(sum((col("l_extendedprice") *
            (lit(1.0) - col("l_discount"))).cast("decimal(28,10)")), 6)
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // Bloom-PREFILTERED join — the shuffle-reduction pattern for
    // fact ⋈ selective-dim at 100 TB: the dim key set folds to a bitmap
    // (map-side bit_or), the fact side is pre-filtered by broadcast bitmap
    // probes BEFORE any join, and the exact equi-join runs on the
    // survivors only. Zero false negatives ⇒ the result is IDENTICAL to
    // the plain join (the oracle is the plain join) — false positives die
    // in the exact join.
    "q_bloom_join" -> ((s, d) => {
      import graft.operators.BloomOps
      val m = 4096L
      val k = 5
      val li = t(s, d, "lineitem")
      val sel = t(s, d, "supplier").filter(col("s_nationkey") < 5)
        .select(col("s_suppkey"))
      // fastHash (codegen xxhash64): the prefilter's RESULT is
      // hash-independent (zero FN under any family), so the md5
      // engine-portable hash isn't needed here — and the pushed-down
      // filter re-inlines the hash per bit check, so its per-row cost
      // is paid ~2k times. Inline literal-array probe: zero joins on
      // the fact side (probe()'s broadcast-join form covers the
      // 10^10-key case and keeps its own oracle row, q_bloom_probe).
      val bitmap = BloomOps.buildBitmap(sel, "s_suppkey", m, k,
        hash = BloomOps.fastHash)
      BloomOps.probeInline(li, "l_suppkey", bitmap, m, k,
          hash = BloomOps.fastHash)
        .filter(col("bloom_hit"))
        .join(broadcast(sel), col("l_suppkey") === col("s_suppkey"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_extendedprice").cast("decimal(28,10)")), 6)
            .cast("double").as("sum_price"))
    }),

    // left-semi join (EXISTS): orders having any heavy line item.
    "q_semi_join" -> ((s, d) => {
      val o = t(s, d, "orders")
      val heavy = t(s, d, "lineitem").filter(col("l_quantity") >= 49.0)
      o.join(heavy, o("o_orderkey") === heavy("l_orderkey"), "left_semi")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 6).as("sum_price"))
    }),

    // skew-salted join (SkewOps): the fact side salted into 8 sub-keys, the
    // dim side replicated — the result must equal the plain join, which is
    // exactly what the oracle computes. The manual fallback for joins AQE's
    // skew splitting can't reach.
    // SALTED two-phase aggregation (SkewOps.saltedSum): a 5-value hot-key
    // space (event_type) first aggregates on (key, salt) — 8× the
    // parallelism for the reduce — then folds the partials. The oracle is
    // the plain groupBy: salting must be invisible in the result. Exact
    // integer cents.
    "q_skew_agg" -> ((s, d) => {
      import graft.operators.SkewOps
      val ev = GraftSession.events(s, d)
        .select(col("event_type"),
          round(col("value") * 100, 0).cast("long").as("cents"))
      SkewOps.saltedSum(ev, "event_type", "cents", salts = 8,
        out = "sum_cents")
    }),

    "q_skew_join" -> ((s, d) => {
      val li = t(s, d, "lineitem").select(col("l_orderkey"), col("l_quantity"))
      val dim = t(s, d, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
      graft.operators.SkewOps.saltedJoin(li, dim, "l_orderkey", salts = 8)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 6).as("sum_qty"))
    }),

    // as-of join (Spark has no native ASOF): every event picks up the
    // latest prior per-user purchase snapshot. Union-window form — one
    // shuffle on user_id, one per-partition sort, NO join node; a naive
    // rts <= lts join would be quadratic per user. Matched values sum in
    // DECIMAL (order-exact) before the final cast.
    "q_asof_join" -> ((s, d) => {
      val ev = GraftSession.events(s, d)
      val snaps = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), date_trunc("HOUR", col("ts")).as("rts"))
        .agg(max(col("value")).as("rv"))
      graft.operators.JoinOps.asofJoin(
          ev, snaps, Seq("user_id"), "ts", "rts", "rv")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(when(col("asof_value").isNotNull, 1).otherwise(0))
            .cast("long").as("n_matched"),
          coalesce(sum(col("asof_value").cast("decimal(18,2)")), lit(0))
            .cast("double").as("sum_asof"))
    }),

    // bucketized range join (point-in-interval): events matched to 30-min
    // maintenance windows. An inequality-only join plans as
    // BroadcastNestedLoopJoin — O(points × windows); gridding both sides to
    // the window length makes it an equi-join on the grid cell
    // (plan-asserted: no BNLJ/cartesian).
    "q_range_join" -> ((s, d) => {
      val ev = GraftSession.events(s, d)
      val windows = ev.filter(col("event_id") % 97 === 0)
        .select(col("event_id").as("window_id"),
          unix_micros(col("ts")).as("ws"),
          (unix_micros(col("ts")) + 1800L * 1000000L).as("we"))
      graft.operators.JoinOps.rangeJoin(
          ev, unix_micros(col("ts")), windows, col("ws"), col("we"),
          bucketWidth = 1800L * 1000000L)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("window_id")).as("n_windows"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
    }),

    // time-slice union + dedup (timeslice.py:94-131 insert/replace analog):
    // two overlapping time windows unioned, duplicates dropped on the key.
    "q_union_slices" -> ((s, d) => {
      val ev = GraftSession.events(s, d)
      val a = ev.filter(col("ts") < lit("2024-01-10").cast("timestamp"))
      val b = ev.filter(col("ts") >= lit("2024-01-05").cast("timestamp") &&
                        col("ts") < lit("2024-01-15").cast("timestamp"))
      a.unionByName(b).dropDuplicates("event_id")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 6).as("sum_value"))
    }),

    // grouping sets: rollup over (event_type, day) with subtotal rows —
    // absent from the reference, free on the relational cube (SURVEY §2.4)
    "q_rollup" -> ((s, d) => {
      GraftSession.events(s, d)
        .withColumn("day", date_trunc("DAY", col("ts")))
        .rollup(col("event_type"), col("day"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 6).as("sum_value"))
    }),

    // pivot: the long→wide OLAP reshape (one map-side-combined aggregation
    // — Catalyst compiles an explicit-values pivot to a single agg with
    // one conditional branch per value, never a per-value rescan). Values
    // are declared, so the output schema is static and engine-portable.
    "q_pivot" -> ((s, d) => {
      GraftSession.events(s, d)
        .withColumn("day", date_trunc("DAY", col("ts")))
        .groupBy("day")
        .pivot("event_type", Seq("view", "click", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0L) // absent (day, type) combos: 0 like the oracle's SUM
    }),

    // full CUBE lattice + grouping_id over (event_type, day): all four
    // grouping sets in ONE map-side-combined aggregation (Catalyst expands
    // the lattice before the shuffle — no per-set rescan); DECIMAL value
    // sums so every cell is order-free exact
    "q_cube_agg" -> ((s, d) => {
      GraftSession.events(s, d)
        .withColumn("day", date_trunc("DAY", col("ts")))
        .cube(col("event_type"), col("day"))
        .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
          round(sum(col("value").cast("decimal(18,6)")), 6).cast("double")
            .as("sum_value"))
    }),

    // select_label_subset (select.py:221-347): drop whole time slices (days)
    // where the share of valid rows fails a predicate; here keep days whose
    // error-event share is < 0.198. Aggregate → semi-join back, one shuffle
    // each; at scale the per-day agg is tiny and broadcast back.
    "q_label_subset" -> ((s, d) => {
      val ev = GraftSession.events(s, d).withColumn("day", to_date(col("ts")))
      val goodDays = ev.groupBy("day")
        .agg((sum(when(col("event_type") === "error", 1).otherwise(0)) / count(lit(1))).as("err_share"))
        .filter(col("err_share") < 0.198)
        .select("day")
      ev.join(broadcast(goodDays), Seq("day"), "left_semi")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 6).as("sum_value"))
    })
  )

  override def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 6) AS sum_qty,
         round(sum(l_extendedprice), 6) AS sum_base_price,
         round(sum(l_extendedprice * (1.0 - l_discount)), 6) AS sum_disc_price,
         round(avg(l_quantity), 6) AS avg_qty,
         round(avg(l_discount), 6) AS avg_disc,
         count(*) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus""",
    "q_select_vars" ->
      """SELECT p_partkey, p_brand, p_retailprice FROM part
         WHERE p_retailprice > 910.0""",
    "q_temporal_subset" ->
      """SELECT event_type, count(*) AS n, round(sum(value), 6) AS sum_value
         FROM events
         WHERE ts >= TIMESTAMP '2024-01-03' AND ts < TIMESTAMP '2024-01-05' + INTERVAL 1 DAY
         GROUP BY event_type""",
    "q_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""",
    "q_join_pricing" ->
      """SELECT c_mktsegment,
         round(sum(l_extendedprice * (1.0 - l_discount)), 6) AS revenue,
         count(*) AS n_items
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment""",
    "q_semi_join" ->
      """SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 6) AS sum_price
         FROM orders WHERE EXISTS (
           SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 49.0)
         GROUP BY o_orderstatus""",
    "q_skew_join" ->
      """SELECT o_orderpriority, count(*) AS n, round(sum(l_quantity), 6) AS sum_qty
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderpriority""",
    "q_asof_join" ->
      """WITH r AS (SELECT user_id, date_trunc('hour', ts) AS rts, max(value) AS rv
                    FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
         SELECT e.event_type, count(*) AS n,
                sum(CASE WHEN r.rv IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_matched,
                coalesce(sum(CAST(r.rv AS DECIMAL(18,2))), 0)::DOUBLE AS sum_asof
         FROM events e ASOF LEFT JOIN r ON e.user_id = r.user_id AND e.ts >= r.rts
         GROUP BY e.event_type""",
    "q_range_join" ->
      """WITH w AS (SELECT event_id AS window_id, ts AS s, ts + INTERVAL 30 MINUTE AS e
                    FROM events WHERE event_id % 97 = 0)
         SELECT p.event_type, count(*) AS n_pairs,
                count(DISTINCT w.window_id) AS n_windows,
                sum(CAST(p.value AS DECIMAL(18,2)))::DOUBLE AS sum_value
         FROM events p JOIN w ON p.ts >= w.s AND p.ts < w.e
         GROUP BY p.event_type""",
    "q_union_slices" ->
      """WITH u AS (
           SELECT DISTINCT ON (event_id) * FROM (
             SELECT * FROM events WHERE ts < TIMESTAMP '2024-01-10'
             UNION ALL
             SELECT * FROM events WHERE ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-15')
         )
         SELECT event_type, count(*) AS n, round(sum(value), 6) AS sum_value
         FROM u GROUP BY event_type""",
    "q_rollup" ->
      """SELECT event_type, date_trunc('day', ts) AS day,
                count(*) AS n, round(sum(value), 6) AS sum_value
         FROM events GROUP BY ROLLUP (event_type, day)""",
    "q_skew_agg" ->
      """SELECT event_type,
                sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS sum_cents
         FROM events GROUP BY event_type""",
    "q_bloom_join" ->
      """SELECT l_returnflag, count(*)::BIGINT AS n,
                round(sum(l_extendedprice::DECIMAL(28,10)), 6)::DOUBLE
                  AS sum_price
         FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         WHERE s_nationkey < 5
         GROUP BY l_returnflag""",
    "q_star_join" ->
      """SELECT n_name,
                round(sum((l_extendedprice * (1.0 - l_discount))
                          ::DECIMAL(28,10)), 6)::DOUBLE AS revenue,
                count(*)::BIGINT AS n_items
         FROM lineitem
         JOIN orders   ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey
                      AND c_nationkey = s_nationkey
         JOIN nation   ON s_nationkey = n_nationkey
         JOIN region   ON n_regionkey = r_regionkey
         WHERE r_regionkey < 3
         GROUP BY n_name""",
    "q_pivot" ->
      """SELECT date_trunc('day', ts) AS day,
                sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS view,
                sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS click,
                sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS purchase,
                sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)::BIGINT AS signup,
                sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS error
         FROM events GROUP BY day""",
    "q_cube_agg" ->
      """SELECT event_type, date_trunc('day', ts) AS day,
                GROUPING(event_type, day)::BIGINT AS gid,
                count(*) AS n,
                round(sum(value::DECIMAL(18,6)), 6)::DOUBLE AS sum_value
         FROM events GROUP BY CUBE (event_type, day)""",
    "q_label_subset" ->
      """WITH good_days AS (
           SELECT CAST(ts AS DATE) AS day
           FROM events GROUP BY 1
           HAVING sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::DOUBLE / count(*) < 0.198)
         SELECT event_type, count(*) AS n, round(sum(value), 6) AS sum_value
         FROM events WHERE CAST(ts AS DATE) IN (SELECT day FROM good_days)
         GROUP BY event_type"""
  )
}
