package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dump formatted physical plans for NAMED queries into individual files —
  * the per-round before/after plan evidence (plans/rNN/<query>_<tag>.txt).
  * Run: sbt "runMain graft.PlanDump <sfDir> <outDir> <tag> q1 q2 ..."
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4, "usage: PlanDump <sfDir> <outDir> <tag> <query>...")
    val Array(sfDir, outDir, tag) = args.take(3)
    val names = args.drop(3).toSeq
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val plan = try fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      catch { case e: Throwable => s"FAILED: $e" }
      Files.writeString(Paths.get(outDir, s"${name}_$tag.txt"), plan + "\n")
      println(s"wrote $outDir/${name}_$tag.txt")
    }
    spark.stop()
  }
}
