package graft

import org.apache.spark.sql.SparkSession

/** Per-query construct/execute phase split — the r18 measurement tool:
  * times the query function call (plan construction incl. any eager
  * control-plane work) separately from the action, N rounds each.
  * Run: sbt "runMain graft.PhaseDiag <sfDir> <cpus> <rounds> q1 q2..."
  */
object PhaseDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = args(1)
    val rounds = args(2).toInt
    val names = args.drop(3).toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "8000"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(100000).selectExpr("sum(id * 2)").collect()
    for (r <- 1 to rounds; name <- names) {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val t1 = System.nanoTime()
      df.queryExecution.toRdd.count()
      val t2 = System.nanoTime()
      println(f"[phase] round=$r $name%-24s construct=${(t1 - t0) / 1e9}%.3f exec=${(t2 - t1) / 1e9}%.3f")
    }
    spark.stop()
  }
}
