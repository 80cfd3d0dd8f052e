package graft

import org.apache.spark.sql.SparkSession

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    val df = graft.queries.TextQueries.defs("dedup_simhash")(spark, dir)
    val plan = df.queryExecution.optimizedPlan.toString
    // count occurrences of md5 in the optimized plan: 1 = staged, 32 = inlined
    val md5Count = "md5\\(".r.findAllIn(plan).length
    println(s"SIMHASH md5 occurrences in optimized plan: $md5Count")
    val df2 = graft.queries.TextQueries.defs("dedup_minhash")(spark, dir)
    val plan2 = df2.queryExecution.optimizedPlan.toString
    println(s"MINHASH md5 occurrences in optimized plan: ${"md5\\(".r.findAllIn(plan2).length}")
    println(plan2.take(3000))
    spark.stop()
  }
}
