package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.graftbridge.FunctionRegistration

/** Session-extension entry point:
  *   spark.sql.extensions=graft.GraftExtensions
  * registers the native kernels (graft_dot, graft_cosine,
  * graft_h32_array, graft_simhash, graft_minhash16, graft_rolling_hash16)
  * as SQL functions.
  * For an already-built session use `GraftFunctions.register(spark)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    FunctionRegistration.inject(ext)
}

/** Runtime registration facade (keeps user code out of the bridge pkg). */
object GraftFunctions {
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    FunctionRegistration.register(spark)
}
