package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Similarity search over embedding columns (SURVEY.md §2.8 X3).
  *
  * Two paths:
  *  - [[bruteForceTopK]] — exact cosine top-k via cross join. Correct
  *    baseline; O(Q·N) pairs, viable when the query set is small or as
  *    the per-bucket verifier below.
  *  - [[ivfTopK]] — IVF-style approximate search: corpus bucketed by
  *    nearest coarse centroid (one shuffle, reusable across queries),
  *    queries probe only the `nProbe` nearest buckets. This is the
  *    100 TB path: the cross join shrinks from N to N·nProbe/K per
  *    query, and buckets are independent partitions.
  *
  * Scores are quantized-integer cosine (see
  * [[graft.functions.QuantizedDot]]): deterministic in any execution
  * order, hence oracle-reproducible.
  */
object SimilarityOps {

  /** cosine = qdot / sqrt(qnorm2(a) * qnorm2(b)) — all-integer until
    * the final division, so bitwise identical on any engine.
    */
  def quantizedCosine(dot: Column, n2a: Column, n2b: Column): Column =
    dot.cast("double") / sqrt((n2a * n2b).cast("double"))

  /** Exact top-k cosine neighbors for each query vector.
    *
    * @param queries  (idCol, vecCol) query vectors
    * @param corpus   (idCol, vecCol) corpus vectors
    * @param k        neighbors per query
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = withNorm(queries, idCol, vecCol).select(
      col(idCol).as("query_id"), col(vecCol).as("__qv"), col("__n2").as("__qn2"))
    val c = withNorm(corpus, idCol, vecCol).select(
      col(idCol).as("neighbor_id"), col(vecCol).as("__cv"), col("__n2").as("__cn2"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        quantizedCosine(VectorFunctions.quantizedDot(col("__qv"), col("__cv")), col("__qn2"), col("__cn2")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

  /** IVF-style ANN: assign corpus vectors to their nearest of
    * `centroids` (deterministically chosen corpus members), then search
    * only the `nProbe` buckets nearest to each query.
    *
    * Centroid choice is seed-free and reproducible: the `nCentroids`
    * corpus vectors with the smallest ids. (A k-means refinement is a
    * drop-in replacement — the bucketing/probing plan is unchanged.)
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
              k: Int, nCentroids: Int, nProbe: Int): DataFrame = {
    val cents = corpus.orderBy(col(idCol)).limit(nCentroids)
      .select(col(idCol).as("centroid_id"), col(vecCol).as("__cent"))
    val centsB = broadcast(cents)

    // bucket assignment: nearest centroid by quantized cosine
    def assign(df: DataFrame, id: String, vec: String, keep: Int): DataFrame = {
      val scored = withNorm(df, id, vec).join(centsB)
        .withColumn("__cscore",
          quantizedCosine(VectorFunctions.quantizedDot(col(vec), col("__cent")),
            col("__n2"), VectorFunctions.quantizedNorm2(col("__cent"))))
      val w = Window.partitionBy(col(id)).orderBy(col("__cscore").desc, col("centroid_id"))
      scored.withColumn("__cr", row_number().over(w)).filter(col("__cr") <= keep)
        .drop("__cscore", "__cr", "__cent")
    }

    val bucketed = assign(corpus, idCol, vecCol, 1)
      .select(col("centroid_id"), col(idCol).as("neighbor_id"), col(vecCol).as("__cv"), col("__n2").as("__cn2"))
    val probes = assign(queries, idCol, vecCol, nProbe)
      .select(col("centroid_id"), col(idCol).as("query_id"), col(vecCol).as("__qv"), col("__n2").as("__qn2"))

    // per-bucket brute force: join is on centroid_id, so only probed
    // buckets are scanned; at scale both sides shuffle-partition by
    // centroid_id instead of a full cross join.
    val scored = probes.join(bucketed, "centroid_id")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        quantizedCosine(VectorFunctions.quantizedDot(col("__qv"), col("__cv")), col("__qn2"), col("__cn2")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }

  private def withNorm(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.withColumn("__n2", VectorFunctions.quantizedNorm2(col(vecCol)))
}
