package org.apache.spark.sql.graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.classic

/** Per-plan conf scoping WITHOUT mutating shared session state.
  * `cloneSession` and `Dataset.ofRows` are `private[sql]`, so this shim
  * lives inside the `org.apache.spark.sql` package tree (same pattern
  * as [[ColumnBridge]]).
  *
  * A thread-local `SQLConf` override is NOT enough here: most Catalyst
  * rules read `SQLConf.get` (thread-local first), but
  * `InsertAdaptiveSparkPlan` reads the session's own conf — verified on
  * 4.1.2: under a thread-local `spark.sql.adaptive.enabled=false` the
  * aggregate still planned as `AdaptiveSparkPlan`. So instead each root
  * session gets ONE lazily-created clone ("quiet twin") carrying the
  * overrides; plans are rerooted onto it via their analyzed plan. The
  * clone shares the SparkContext and (at clone time) catalog/temp
  * views, its conf is never mutated after creation, and the root
  * session's conf is never touched — concurrent queries on the root
  * keep AQE, concurrent quiet folds race on nothing.
  */
object ConfBridge {

  private val twins =
    new ConcurrentHashMap[(SparkSession, Map[String, String]), SparkSession]()

  /** The cached clone of `spark` carrying `overrides` (created once per
    * (session, overrides) pair). */
  def twinSession(spark: SparkSession,
                  overrides: Map[String, String]): SparkSession =
    twins.computeIfAbsent((spark, overrides), { _ =>
      val q = spark.asInstanceOf[classic.SparkSession].cloneSession()
      overrides.foreach { case (k, v) => q.conf.set(k, v) }
      q
    })

  /** `df` re-expressed against `to` — same analyzed plan, planned and
    * executed under `to`'s conf. */
  def reroot(df: DataFrame, to: SparkSession): DataFrame =
    classic.Dataset.ofRows(to.asInstanceOf[classic.SparkSession],
      df.asInstanceOf[classic.Dataset[org.apache.spark.sql.Row]]
        .queryExecution.analyzed)

  /** [[twinSession]] + [[reroot]] in one call. */
  def withOverrides(df: DataFrame,
                    overrides: Map[String, String]): DataFrame =
    reroot(df, twinSession(df.sparkSession, overrides))
}
