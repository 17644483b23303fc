package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev harness (VERDICT r5 item 3): synthesize a 10× "sf1" bench
  * dataset from the driver's sf0.1 testdata, as 10 disjoint copies —
  * each copy an independent sf0.1-shaped corpus, so the linear-scaling
  * null hypothesis is exact: a scale-clean operator should cost ~10×
  * its sf0.1 time; anything super-linear (quadratic pair joins, global
  * sorts, low-cardinality windows, driver collects) shows up as ≫10×.
  *
  * Copy c remaps every key domain by `+ c·(max+1)` and keeps copy 0
  * verbatim. To keep copies DISJOINT (not 10× exact duplicates, which
  * would distort every dedup/similarity operator into a pathological
  * all-duplicates corpus instead of a bigger organic one):
  *  - documents: every token gets a copy suffix (`tok` → `tokc3`), so
  *    cross-copy shingle/span/minhash overlap is ~zero while
  *    within-copy duplication structure is preserved exactly;
  *  - embeddings: copy c applies a per-(copy, dim) deterministic sign
  *    flip — an orthogonal transform, so within-copy cosines are
  *    EXACTLY preserved and cross-copy cosines are pseudo-random
  *    (|cos| ~ 1/√dim ≪ any near-dup threshold);
  *  - lineitem/orders/events: key offsets only (measure columns
  *    unchanged; more orders/users at the same per-key size).
  *
  * Usage: tools/run.sh graft.tools.ScaleUp /root/testdata/sf0.1 \
  *   /root/repo/benchdata/sf1 10
  */
object ScaleUp {

  private def copies(spark: SparkSession, n: Int): DataFrame =
    spark.range(0, n).select(col("id").cast("long").as("__copy"))

  /** Cross join df with the copy index; offset `keys` by c·(max+1). */
  private def replicate(df: DataFrame, n: Int, spark: SparkSession,
                        keys: Seq[String]): DataFrame = {
    val offsets = keys.map { k =>
      // getAs[Number]: key columns are long in current testdata but an
      // int-typed key must not throw here
      k -> (df.agg(max(col(k))).head().getAs[Number](0).longValue() + 1L)
    }
    val crossed = df.crossJoin(broadcast(copies(spark, n)))
    offsets.foldLeft(crossed) { case (d, (k, off)) =>
      d.withColumn(k, col(k) + col("__copy") * off)
    }
  }

  def main(args: Array[String]): Unit = {
    val src = args(0); val dst = args(1); val n = args(2).toInt
    val spark = graft.GraftSession.tuned(
        SparkSession.builder().master("local[32]")
          .config("spark.ui.enabled", "false"), 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def load(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def save(df: DataFrame, t: String) =
      df.drop("__copy").repartition(32)
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")

    // documents: doc_id offset + per-copy token suffix (copy 0 verbatim)
    save(replicate(load("documents"), n, spark, Seq("doc_id"))
      .withColumn("text",
        when(col("__copy") === 0, col("text"))
          .otherwise(regexp_replace(col("text"), lit("([^ ]+)"),
            concat(lit("$1c"), col("__copy"))))), "documents")

    // embeddings: vec_id offset + per-(copy, dim) sign flip (copy 0
    // verbatim; sign pattern from xxhash64(copy, dim) — orthogonal)
    save(replicate(load("embeddings"), n, spark, Seq("vec_id"))
      .withColumn("embedding", expr(
        """CASE WHEN __copy = 0 THEN embedding
          |ELSE transform(embedding, (x, j) ->
          |  CAST(CASE WHEN pmod(xxhash64(__copy, j), 2) = 0 THEN x
          |            ELSE -x END AS FLOAT)) END""".stripMargin)),
      "embeddings")

    save(replicate(load("lineitem"), n, spark, Seq("l_orderkey")), "lineitem")
    save(replicate(load("orders"), n, spark, Seq("o_orderkey")), "orders")
    // event_id offsets alongside user_id so events stay globally
    // unique by event_id across copies
    save(replicate(load("events"), n, spark, Seq("user_id", "event_id")), "events")

    // small dims pass through unscaled
    for (t <- Seq("region", "nation", "customer", "supplier", "part"))
      save(load(t).withColumn("__copy", lit(0L)), t)

    for (t <- Seq("documents", "embeddings", "lineitem", "orders", "events"))
      println(s"$t rows = ${spark.read.parquet(s"$dst/$t.parquet").count()}")
    spark.stop()
  }
}
