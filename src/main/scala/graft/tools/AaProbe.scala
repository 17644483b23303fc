package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.sources.{Materializer, Tables}

/** Dev harness: stage-by-stage timing of the g6_adamic_adar plan so
  * the wedge/aggregate/anti-join costs attribute separately.
  * `tools/run.sh graft.tools.AaProbe <sfDir>`
  */
object AaProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.tuned(
        SparkSession.builder().master("local[32]")
          .config("spark.ui.enabled", "false"), 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args(0)
    val mat = Materializer.Local

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    for (rep <- 1 to 2) {
      println(s"=== rep $rep ===")
      val li = Tables.load(spark, dir, "lineitem")
        .filter(col("l_quantity") > 25)
        .select(col("l_orderkey").as("ok"), col("l_partkey").cast("long").as("pk"))
        .distinct()
      val edges = li.as("a").join(li.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .select(col("a.pk").as("src"), col("b.pk").as("dst"))

      val e = time("freeze_e")(mat.freeze(
        edges.select(col("src").cast("long").as("a"), col("dst").cast("long").as("b"))
          .filter(col("a") =!= col("b"))
          .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
          .distinct(),
        Seq("u"), "aa_edges"))
      val adj = e.select(col("u").as("node"), col("v").as("nbr"))
        .union(e.select(col("v").as("node"), col("u").as("nbr")))
      val deg = adj.groupBy(col("node")).agg(count(lit(1)).as("deg"))
      val pairable = time("freeze_pairable")(mat.freeze(adj
        .join(deg.filter(col("deg") >= 2 && col("deg") <= 64), Seq("node"))
        .withColumn("aa_q",
          round(lit(1e6) / log(col("deg").cast("double"))).cast("long")),
        Seq("node"), "aa_pairable"))
      println(s"  |e| = ${e.count()}  |pairable| = ${pairable.count()}")
      val r = pairable.select(col("node").as("node2"), col("nbr").as("nbr2"))
      val wedges = pairable
        .join(r, col("node") === col("node2") && col("nbr") < col("nbr2"))
      time("wedges_count")(println(s"  wedges = ${wedges.count()}"))
      val scored = wedges
        .groupBy(col("nbr").as("x"), col("nbr2").as("y"))
        .agg(count(lit(1)).as("common_cnt"), sum(col("aa_q")).as("score_q"))
      time("scored_noop")(noop(scored))
      val out = scored
        .join(e, col("x") === col("u") && col("y") === col("v"), "left_anti")
        .orderBy(col("score_q").desc, col("x"), col("y"))
        .limit(50)
      time("full_rest")(noop(out))
    }
    spark.stop()
  }
}
