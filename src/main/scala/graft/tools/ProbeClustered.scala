package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.SimilarityOps

/** Dev harness (VERDICT r6 item 7 / r7 item 7): the recall numbers in
  * BASELINE.md are measured on the driver's near-orthogonal synthetic
  * embeddings — the WORST case for every cell-based method (k-means
  * cells carve a uniform sphere arbitrarily, so near neighbors land in
  * different cells at the base rate). Real-world embedding corpora are
  * clustered, which is the case IVF/PQ/SemDeDup are designed for. This
  * probe generates a Gaussian-mixture corpus with the SAME shape as
  * the driver's embeddings table (2000 rows x 64 dims) and re-measures
  * the same sweeps at the same parameters, so BASELINE.md can record
  * both ends of the spectrum.
  *
  * Generator: `nClusters` unit-sphere centers (seeded Random), each
  * point = L2-normalized(center + sigma * gaussian). Deterministic —
  * fixed seed, no query-time RNG, same discipline as the reference's
  * pre-stored permutations.
  *
  * `tools/run.sh graft.tools.ProbeClustered [nClusters] [sigma]`
  */
object ProbeClustered {
  def main(args: Array[String]): Unit = {
    val nClusters = if (args.length > 0) args(0).toInt else 32
    val sigma = if (args.length > 1) args(1).toDouble else 0.25
    val nRows = 2000
    val dim = 64
    val spark = graft.GraftSession.tuned(
        SparkSession.builder().master("local[16]")
          .config("spark.ui.enabled", "false"), 16)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val rnd = new scala.util.Random(42)
    def unit(v: Array[Double]): Array[Float] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    val centers = Array.fill(nClusters)(unit(Array.fill(dim)(rnd.nextGaussian())))
    val rows = (0 until nRows).map { i =>
      val c = centers(i % nClusters)
      val v = unit(c.map(_.toDouble).zip(Array.fill(dim)(rnd.nextGaussian()))
        .map { case (cv, g) => cv + sigma * g })
      (i.toLong, v.toSeq, i % nClusters)
    }
    val emb = rows.toDF("vec_id", "embedding", "label").cache()
    println(s"=== clustered corpus: $nRows x $dim, $nClusters clusters, sigma=$sigma ===")

    val queries = emb.filter(col("vec_id") % 10 === 0)
    val bf = SimilarityOps.bruteForceTopK(queries, emb, "vec_id", "embedding", 5)
    val truth = bf.select("query_id", "neighbor_id").cache()
    val nTruth = truth.count()
    println(s"brute-force truth pairs: $nTruth")

    // IVF recall@5 — same sweep as Probe section 4
    for (iters <- Seq(0, 1, 2, 3); nProbe <- Seq(1, 2, 4)) {
      val got = SimilarityOps.ivfTopK(queries, emb, "vec_id", "embedding",
          5, 16, nProbe, iters)
        .select("query_id", "neighbor_id")
      val recall = got.intersect(truth).count().toDouble / nTruth
      println(f"ivf recall@5 nProbe=$nProbe iters=$iters: $recall%.4f")
    }

    // RHP LSH recall@5 — same sweep as Probe section 4b
    for (nBits <- Seq(6, 8); ham <- Seq(0, 1, 2); tables <- Seq(1, 4, 8)) {
      val got = SimilarityOps.rhpTopK(queries, emb, "vec_id", "embedding",
          5, nBits, ham, tables)
        .select("query_id", "neighbor_id")
      val recall = got.intersect(truth).count().toDouble / nTruth
      println(f"rhp recall@5 nBits=$nBits hamming=$ham tables=$tables: $recall%.4f")
    }

    // PQ / IVF-PQ recall@5 — same sweep as Probe section 4c
    for (m <- Seq(4, 8); nCodes <- Seq(16, 64); refine <- Seq(0, 20)) {
      val cb = SimilarityOps.pqCodebooks(emb, "vec_id", "embedding", m, nCodes, 1)
      val got = SimilarityOps.pqTopK(queries, emb, "vec_id", "embedding",
          5, cb, m, refine).select("query_id", "neighbor_id")
      val recall = got.intersect(truth).count().toDouble / nTruth
      println(f"pq recall@5 M=$m codes=$nCodes refine=$refine: $recall%.4f")
    }
    for ((np, refine) <- Seq((2, 20), (4, 20))) {
      val cents = SimilarityOps.ivfCentroids(emb, "vec_id", "embedding", 16, 2)
      val cb = SimilarityOps.pqCodebooks(emb, "vec_id", "embedding", 8, 64, 1)
      val got = SimilarityOps.ivfPqTopK(queries, emb, "vec_id", "embedding",
          5, cents, np, cb, 8, refine).select("query_id", "neighbor_id")
      val recall = got.intersect(truth).count().toDouble / nTruth
      println(f"ivfpq recall@5 nProbe=$np refine=$refine: $recall%.4f")
    }

    // IVF near-dup pair recall vs all-pairs — same sweep as Probe 5
    val basePairs = SimilarityOps.cosineNearDupPairs(emb, "vec_id", "embedding", 9, 20)
      .select("id_a", "id_b").cache()
    val nBase = basePairs.count()
    println(s"true cosine>=0.45 pairs: $nBase")
    for ((k, np) <- Seq((16, 2), (16, 4), (32, 2), (32, 4), (64, 4))) {
      val cents = SimilarityOps.ivfCentroids(emb, "vec_id", "embedding", k, 2)
      val got = SimilarityOps.cosineNearDupPairsIvf(emb, "vec_id", "embedding",
          9, 20, cents, np).select("id_a", "id_b")
      val hit = got.intersect(basePairs).count()
      println(f"neardup ivf K=$k nProbe=$np: $hit/$nBase = ${hit.toDouble / math.max(nBase, 1)}%.4f")
    }

    // SemDeDup pair coverage + drop rate — same sweep as Probe 6
    for (k <- Seq(16, 64)) {
      val cents = SimilarityOps.ivfCentroids(emb, "vec_id", "embedding", k, 2)
      val sd = SimilarityOps.semDedup(emb, "vec_id", "embedding", 9, 20, cents)
      val asg = sd.select(col("vec_id"), col("centroid_id"))
      val co = basePairs
        .join(asg.toDF("id_a", "ca"), "id_a")
        .join(asg.toDF("id_b", "cb"), "id_b")
        .filter(col("ca") === col("cb")).count()
      val dropped = sd.filter(!col("kept")).count()
      println(f"semdedup K=$k: pairCoverage $co/$nBase = " +
        f"${co.toDouble / math.max(nBase, 1)}%.4f dropped=$dropped/${sd.count()}")
    }
    spark.stop()
  }
}
