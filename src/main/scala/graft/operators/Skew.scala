package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities for joins whose key distribution is heavy
  * tailed (the canonical 100 TB failure mode: one hot key lands a
  * whole shuffle partition on one executor).
  *
  * Two complementary mechanisms:
  *  - AQE skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`,
  *    on by default) — runtime re-planning, no code change; the first
  *    line of defense.
  *  - Explicit salting ([[saltedJoin]]) — for deterministic plans,
  *    pre-AQE Sparks, or aggregations AQE cannot split. The build side
  *    is replicated `saltFactor`× (one copy per salt value); the probe
  *    side gets a uniform random-ish salt derived from a stable hash
  *    of its row, so the hot key's rows spread over `saltFactor`
  *    shuffle partitions.
  */
object Skew {

  /** Salted inner equi-join: `left ⋈ right ON leftKey = rightKey`,
    * with `right` replicated across `saltFactor` salts and `left`
    * salted deterministically (hash of the whole row mod factor — no
    * rand(), so plans stay reproducible and retries are safe: a task
    * retry must salt identically or rows are lost/duplicated).
    */
  def saltedJoin(left: DataFrame, right: DataFrame,
                 leftKey: String, rightKey: String,
                 saltFactor: Int = 8): DataFrame = {
    val salts = (0 until saltFactor).map(lit(_))
    val saltedLeft = left.withColumn("_salt",
      pmod(hash(left.columns.map(col): _*), lit(saltFactor)))
    val saltedRight = right.withColumn("_salt",
      explode(array(salts: _*)))
    saltedLeft.join(saltedRight,
        saltedLeft(leftKey) === saltedRight(rightKey)
          && saltedLeft("_salt") === saltedRight("_salt"))
      .drop("_salt")
  }

  /** Two-phase skewed aggregation: partial-aggregate on (key, salt),
    * then final-aggregate on key. Spark's HashAggregate already does
    * map-side partials, but for extreme single-key skew the FINAL
    * aggregation of one key still lands on one reducer; pre-splitting
    * by salt bounds any reducer's load at 1/saltFactor of the hot key.
    * Works for any commutative+associative aggregate; here: sum, count.
    */
  def skewedSumCount(df: DataFrame, key: String, value: String,
                     saltFactor: Int = 8): DataFrame =
    df.withColumn("_salt", pmod(hash(col(value)), lit(saltFactor)))
      .groupBy(col(key), col("_salt"))
      .agg(sum(col(value)).as("_psum"), count(lit(1)).as("_pn"))
      .groupBy(col(key))
      .agg(sum(col("_psum")).as("sum_value"), sum(col("_pn")).as("n"))

  /** [[skewedSumCount]] with exact DECIMAL accumulation, so the salted
    * two-phase result is bit-identical to a plain GROUP BY (double
    * partials would re-associate the sum differently per salt split) —
    * the oracle-gated form proving salt-phase equivalence.
    */
  def skewedSumCountExact(df: DataFrame, key: String, value: String,
                          saltFactor: Int = 8): DataFrame =
    df.withColumn("_salt", pmod(hash(col(value)), lit(saltFactor)))
      .groupBy(col(key), col("_salt"))
      .agg(sum(col(value).cast("decimal(30,2)")).as("_psum"),
        count(lit(1)).as("_pn"))
      .groupBy(col(key))
      .agg(sum(col("_psum")).cast("double").as("sum_value"),
        sum(col("_pn")).as("n"))
}
