package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dfw.{SplitOps, TransformOps}

/** Dev harness for the sf10 second-decade proof: times the stages of
  * the gen_pipeline_multi / w1_split_scalable plan separately so a
  * super-linear term can be attributed to ONE stage instead of the
  * whole pipeline. `tools/run.sh graft.tools.DecadeProbe <sfDir>
  * [parts]` — `parts` overrides the rank shuffle's partition count
  * (0 = adaptive default).
  */
object DecadeProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.tuned(
        SparkSession.builder().master("local[32]")
          .config("spark.ui.enabled", "false"), 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args(0)
    val parts = if (args.length > 1) args(1).toInt else 0

    def feature(): DataFrame =
      graft.sources.Tables.load(spark, dir, "lineitem").select(
        col("l_returnflag").as("cls"),
        (col("l_orderkey") * 10 + col("l_linenumber")).cast("long").as("sample_id"),
        (((col("l_orderkey") % 999983L) * 2654435761L + col("l_linenumber") * 40503L) % 1000000007L)
          .cast("long").as("perm"),
        col("l_quantity"), col("l_extendedprice"))

    def time(label: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"STAGE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val base = feature()
    val descrs = Seq(
      ("default", array(col("l_quantity"), col("l_extendedprice"))),
      ("qty", array(col("l_quantity"))))
    def both(): DataFrame = TransformOps.unionAll(descrs.map { case (d, feats) =>
      base.withColumn("descriptor", lit(d)).withColumn("features", feats)
        .select("descriptor", "cls", "sample_id", "perm", "features")
    })
    def rankedD(): DataFrame =
      SplitOps.rankByPermutationScalable(both(), Seq("descriptor", "cls"),
        Seq(col("perm"), col("sample_id"), element_at(col("features"), 1),
          coalesce(try_element_at(col("features"), lit(2)), lit(0.0))),
        numParts = parts)
    def centered(): DataFrame = {
      val split = SplitOps.trainTestSplit(rankedD(), SplitOps.Frac(0.5), 5)
      TransformOps.centerFeatureArrayFast(split, Seq("descriptor"), "role", "features")
        .select(col("descriptor"), col("cls"), col("sample_id"), col("role"),
          round(element_at(col("features_centered"), 1), 6).as("f1_c"),
          round(try_element_at(col("features_centered"), lit(2)), 4).as("f2_c"))
    }

    println(s"adaptiveRangeParts(both) = ${SplitOps.adaptiveRangeParts(both())}")
    time("scan_union")(both())
    time("rank")(rankedD())
    time("rank_again")(rankedD())
    time("centered_no_sort")(centered())
    time("full_with_orderby")(
      centered().orderBy(col("descriptor"), col("cls"), col("sample_id"),
        col("role"), col("f1_c"), col("f2_c")))
    spark.stop()
  }
}
