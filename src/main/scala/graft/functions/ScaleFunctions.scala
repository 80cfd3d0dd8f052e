package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation building blocks for 100 TB plans. AQE's skew-join
  * splitting handles sort-merge joins automatically; explicit salting is
  * the fallback for the cases AQE can't split (e.g. aggregation hotspots,
  * or hash joins where one key dominates both sides).
  */
object ScaleFunctions {

  /** Salted equi-join for a skewed fact side: the fact gets a uniform
    * salt in [0, salts); the (small-ish but not broadcastable) build side
    * is replicated once per salt so every (key, salt) pair co-locates.
    * Shuffle volume: fact unchanged, build side x salts — bounded and
    * chosen by the caller. Result is identical to the unsalted join for
    * any salt assignment, so the non-deterministic salt is safe.
    */
  def saltedJoin(fact: DataFrame, build: DataFrame, key: String, salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("_salt",
      pmod(hash(monotonically_increasing_id()), lit(salts)))
    val saltedBuild = build.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(saltedBuild, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase aggregation for a skewed group key: partial aggregate on
    * (key, salt), then final aggregate on key. Spark's hash aggregate
    * already does map-side partials; the explicit form matters when the
    * partial itself needs to spread (e.g. collect-like or distinct-heavy
    * aggregates on a hot key).
    */
  def saltedSum(df: DataFrame, key: String, value: String, salts: Int): DataFrame =
    df.withColumn("_salt", pmod(hash(monotonically_increasing_id()), lit(salts)))
      .groupBy(col(key), col("_salt"))
      .agg(sum(value).as("_partial"))
      .groupBy(col(key))
      .agg(sum("_partial").as(s"sum_$value"))
}
