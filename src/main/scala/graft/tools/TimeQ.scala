package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness: time one named query N times in a single JVM and dump
  * its formatted plan. `tools/run.sh graft.tools.TimeQ <name> <sfDir>`.
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.tuned(
        SparkSession.builder().master("local[32]")
          .config("spark.ui.enabled", "false"), 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val name = args(0); val dir = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val fn = graft.Queries.queryMap(name)
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      println(s"RUN$i ${(System.nanoTime() - t0) / 1e9}")
    }
    if (sys.env.contains("EXPLAIN")) fn(spark, dir).explain("formatted")
    spark.stop()
  }
}
