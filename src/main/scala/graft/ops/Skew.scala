package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities. AQE's skew-join split (enabled in
  * GraftSession) handles join-side skew at runtime; SALTED AGGREGATION is
  * the explicit form for aggregations over pathologically hot keys, where
  * one reducer would otherwise receive a whole key's rows.
  *
  * Two-phase shape: groupBy(key, salt) computes partial aggregates across
  * `salts` reducers per key, then groupBy(key) merges the partials. The
  * shown aggregates are reassociatable: counts/min/max are exactly equal to
  * the unsalted form; double sums are equal up to floating-point
  * reassociation (last-ulp drift when the regrouping changes summation
  * order) — both pinned by SkewSpec.
  *
  * At 100 TB: hot keys in the events stream (a viral user, a default
  * city_id) would stall the single-reducer plan; salting bounds any
  * reducer's share to 1/salts of the hottest key.
  */
object Skew {

  /** Salted per-key count/sum/min/max over `valueCol`, numerically equal to
    * the direct `groupBy(key)` aggregate.
    */
  def saltedStats(df: DataFrame, key: String, valueCol: String, salts: Int = 16): DataFrame = {
    val salted = df.withColumn(
      "__salt", (rand(seed = 42) * salts).cast("int"))
    salted
      .groupBy(col(key), col("__salt"))
      .agg(
        count(lit(1)).as("__n"),
        sum(col(valueCol)).as("__sum"),
        min(col(valueCol)).as("__min"),
        max(col(valueCol)).as("__max"))
      .groupBy(col(key))
      .agg(
        sum(col("__n")).as("n"),
        sum(col("__sum")).as("sum_value"),
        min(col("__min")).as("min_value"),
        max(col("__max")).as("max_value"))
  }

  /** Unsalted reference form, for equivalence testing. */
  def directStats(df: DataFrame, key: String, valueCol: String): DataFrame =
    df.groupBy(col(key))
      .agg(
        count(lit(1)).as("n"),
        sum(col(valueCol)).as("sum_value"),
        min(col(valueCol)).as("min_value"),
        max(col(valueCol)).as("max_value"))

  /** Salted broadcast-join helper for a skewed fact ⋈ small dim: explodes
    * the dim to (dimKey, salt) pairs so the fact side's hot key spreads
    * over `salts` partitions even under a shuffle join.
    */
  def saltedDimForJoin(dim: DataFrame, key: String, salts: Int = 16): DataFrame =
    dim.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))

  def saltFactKey(fact: DataFrame, salts: Int = 16): DataFrame =
    fact.withColumn("__salt", (rand(seed = 42) * salts).cast("int"))
}
