package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for document corpora
  * (SURVEY.md §2.8 X1/X2).
  *
  * Scale posture: exact dedup is one hash shuffle on the key; the
  * near-dup family avoids the O(N²) pair space via inverted-index
  * (shingle) joins, MinHash+LSH banding, or SimHash chunk banding —
  * the only sub-quadratic options at 100 TB.
  */
object DedupOps {

  /** X1: exact dedup — keep the lowest-id row per key; adds `n_dups`
    * (group size). One shuffle on the key.
    */
  def exactDedup(df: DataFrame, keyCol: Column, idCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(idCol))
    val wAll = Window.partitionBy(keyCol)
    df.withColumn("__rn", row_number().over(w))
      .withColumn("n_dups", count(lit(1)).over(wAll))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Distinct word `w`-gram shingles per document:
    * `(doc_id, sh STRING)`. Documents shorter than `w` tokens yield
    * no shingles.
    */
  def wordShingles(docs: DataFrame, idCol: String, textCol: String, w: Int): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("toks"))
      .filter(size(col("toks")) >= w)
      .select(col("doc_id"),
        explode(expr(s"transform(sequence(1, size(toks) - ${w - 1}), i -> concat_ws(' ', slice(toks, i, $w)))")).as("sh"))
      .distinct()

  /** X2 (exact n-gram Jaccard): all pairs with
    * |A∩B| / |A∪B| >= `num/den`, computed over the shingle
    * inverted index — pairs sharing zero shingles are never
    * materialized. The threshold test `den·inter >= num·union` stays
    * in exact integer arithmetic.
    */
  def jaccardPairs(shingles: DataFrame, num: Int, den: Int): DataFrame = {
    val sizes = shingles.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val a = shingles.select(col("doc_id").as("doc1"), col("sh"))
    val b = shingles.select(col("doc_id").as("doc2"), col("sh"))
    val inter = a.join(b, Seq("sh")).filter(col("doc1") < col("doc2"))
      .groupBy("doc1", "doc2").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc1").withColumnRenamed("n_sh", "n1"), "doc1")
      .join(sizes.withColumnRenamed("doc_id", "doc2").withColumnRenamed("n_sh", "n2"), "doc2")
      .withColumn("uni", col("n1") + col("n2") - col("inter"))
      .filter(col("inter") * den >= col("uni") * num)
      .select("doc1", "doc2", "inter", "uni")
  }

  /** MinHash signature per document: `sig[i] = min over shingles of
    * xxhash64(i, shingle)`. `numHashes` independent hash functions come
    * from seeding xxhash64 with the function index.
    */
  def minHashSignatures(shingles: DataFrame, numHashes: Int): DataFrame =
    shingles.groupBy("doc_id").agg(
      array((0 until numHashes).map(i => min(xxhash64(lit(i), col("sh")))): _*).as("sig"))

  /** X2 (MinHash + LSH): candidate pairs whose signatures collide in at
    * least one of `bands` bands (rows = numHashes/bands), then verified
    * with exact Jaccard. False negatives possible (LSH recall), false
    * positives eliminated by the verify join. At scale each band is one
    * shuffle on (band, band_hash) — never a cross join.
    */
  def minHashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      shingleW: Int, numHashes: Int, bands: Int,
                      num: Int, den: Int): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    // the shingle set feeds three consumers (signatures, sizes, the
    // verify join); measured: re-deriving it is cheaper than a
    // persist() materialization barrier, so it stays a lazy plan
    val sh = wordShingles(docs, idCol, textCol, shingleW)
    val sig = minHashSignatures(sh, numHashes)
    val banded = sig.select(col("doc_id"),
      posexplode(expr(s"transform(sequence(0, ${bands - 1}), b -> hash(slice(sig, b * $r + 1, $r), b))"))
        .as(Seq("band", "bhash")))
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bhash") === col("y.bhash") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc1"), col("y.doc_id").as("doc2"))
      .distinct()
    // verify candidates with exact Jaccard over shingle sets
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val inter = cand
      .join(sh.select(col("doc_id").as("doc1"), col("sh")), Seq("doc1"))
      .join(sh.select(col("doc_id").as("doc2"), col("sh").as("sh2")), Seq("doc2"))
      .filter(col("sh") === col("sh2"))
      .groupBy("doc1", "doc2").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc1").withColumnRenamed("n_sh", "n1"), "doc1")
      .join(sizes.withColumnRenamed("doc_id", "doc2").withColumnRenamed("n_sh", "n2"), "doc2")
      .withColumn("uni", col("n1") + col("n2") - col("inter"))
      .filter(col("inter") * den >= col("uni") * num)
      .select("doc1", "doc2", "inter", "uni")
  }

  /** Near-dup clustering: connected components over a pair list —
    * every document joined (transitively) by a near-dup edge gets
    * `cluster_id` = the smallest doc id in its component. Iterative
    * min-label propagation with a driver-side convergence loop (the
    * loop is control flow only; data never leaves executors). Dup
    * components are near-cliques, so convergence takes O(component
    * diameter) ≈ 1-3 rounds; the billion-edge generalization swaps in
    * the alternating large-star/small-star iteration on the same
    * DataFrames.
    *
    * @param pairs (doc1, doc2) undirected near-dup edges
    * @return (doc_id, cluster_id) for every doc appearing in a pair
    */
  def clusterNearDups(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val edges = pairs.select(col("doc1").as("a"), col("doc2").as("b"))
      .union(pairs.select(col("doc2").as("a"), col("doc1").as("b")))
      .distinct()
      .cache()
    var labels = edges.select(col("a").as("doc_id")).distinct()
      .withColumn("cluster_id", col("doc_id"))
      .cache()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val nbrMin = edges
        .join(labels.select(col("doc_id").as("b"), col("cluster_id").as("nl")), "b")
        .groupBy(col("a").as("doc_id")).agg(min(col("nl")).as("nbr_min"))
      val next = labels.join(nbrMin, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("cluster_id"), coalesce(col("nbr_min"), col("cluster_id"))).as("cluster_id"))
        .cache()
      val changes = next.join(labels.withColumnRenamed("cluster_id", "old"), "doc_id")
        .filter(col("cluster_id") =!= col("old")).count()
      labels.unpersist()
      labels = next
      converged = changes == 0
      iter += 1
    }
    edges.unpersist()
    labels
  }

  /** 64-bit SimHash fingerprint per document over token hashes:
    * bit j of the fingerprint is the sign of Σ_tokens (±1 by token's
    * bit j). Rows explode 64× per token here; the production-scale
    * variant is a TypedImperativeAggregate holding the 64 counters in
    * its buffer (same semantics, one pass, map-side combinable).
    */
  def simHash(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), explode(split(col(textCol), " ")).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
      .select(col("doc_id"), col("h"), explode(expr("sequence(0, 63)")).as("j"))
      .withColumn("v", when(expr("(h >> j) & 1") === 1, lit(1)).otherwise(lit(-1)))
      .groupBy("doc_id", "j").agg(sum(col("v")).as("s"))
      .groupBy("doc_id")
      .agg(sum(when(col("s") >= 0, expr("shiftleft(CAST(1 AS BIGINT), j)")).otherwise(lit(0L))).as("fp"))

  /** Scale-path SimHash: same fingerprints as [[simHash]] from ONE
    * typed aggregation over token hashes — no 64× row explosion; the
    * 64 counters live in the aggregation buffer and partials merge
    * map-side ([[graft.functions.Aggregators.SimHashAgg]]).
    */
  def simHashFast(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val simhashUdaf = udaf(graft.functions.Aggregators.SimHashAgg,
      org.apache.spark.sql.Encoders.scalaLong)
    docs
      .select(col(idCol).as("doc_id"), explode(split(col(textCol), " ")).as("tok"))
      .select(col("doc_id"), xxhash64(col("tok")).as("h"))
      .groupBy("doc_id")
      .agg(simhashUdaf(col("h")).as("fp"))
  }

  /** SimHash near-dup pairs with Hamming distance <= `maxHamming`
    * (< 16), using 16-bit chunk banding: any pair within distance 3
    * must agree on at least one of the four 16-bit chunks (pigeonhole),
    * so the join is on chunk equality — no cross join.
    */
  def simHashPairs(fps: DataFrame, maxHamming: Int): DataFrame = {
    val chunked = fps.select(col("doc_id"), col("fp"),
      posexplode(expr("transform(sequence(0, 3), c -> (fp >> (c * 16)) & 65535)")).as(Seq("c", "chunk")))
    chunked.as("x").join(chunked.as("y"),
        col("x.c") === col("y.c") && col("x.chunk") === col("y.chunk") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc1"), col("y.doc_id").as("doc2"),
        expr("bit_count(x.fp ^ y.fp)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
