package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.KmvSketch

/** Mergeable-sketch analytics — the pre-aggregation pattern that
  * makes corpus-level distinct statistics affordable at 100 TB:
  * build a fixed-size summary per group in ONE map-side-combined
  * scan, then answer coarser rollups or cross-group set questions by
  * merging summaries (KiBs), never by re-scanning raw data.
  *
  * Two sketch families, chosen by the question:
  *  - HLL (Spark's built-in DataSketches `hll_*` functions): distinct
  *    COUNTS, union-only algebra, ~KB registers — the rollup path.
  *  - KMV bottom-k ([[graft.functions.KmvSketch]]): sample-carrying,
  *    so sketches built independently per group support INTERSECTION
  *    ("how much of src_a's content is also in src_b?") — the
  *    cross-source overlap path HLL cannot answer.
  *
  * Reference (Alrash/DataFramework) has no sketch layer — eager
  * NumPy over in-memory dicts (tools.py) — so both are scale-path
  * extensions; each query carries an exact DuckDB oracle anchor and
  * integer bound-verdict columns (the t5/x4 certification pattern).
  */
object SketchOps {

  /** Cross-source content overlap, sketch-estimated and certified
    * against the exact answer.
    *
    * Production path (what survives 100× scale-up): one pass over
    * the corpus builds a k-slot KMV sketch of the distinct word
    * `n`-gram set per source (map-side combine; the shuffle carries
    * one ≈8 KiB partial per source × task), then every pairwise
    * union/intersection estimate is arithmetic on two retained-sample
    * arrays. The collect is bounded and documented: |sources| rows of
    * k+1 longs each (20 × 8 KiB here) — driver-side pairing of
    * sketches is the point of the design, not a shortcut.
    *
    * Oracle anchor (the quadratic path the sketch replaces): exact
    * per-source distinct shingle sets, pairwise-joined on shingle
    * equality. Output rows are the exact values plus two integer
    * verdicts asserting the estimates landed inside 6-sigma KMV
    * bounds: estimator rsd ≈ 1/sqrt(k) for the union (binomial
    * sampling at threshold θ ≈ k/n_union) and
    * sqrt(n_inter·n_union/k) absolute spread for the intersection
    * (its sample count is Binomial(k, J)), plus a +4 floor for tiny
    * sets. Exactness when a source's shingle set fits in k slots is
    * a property, not a special case (KmvSketchSpec pins it).
    */
  /** Word `n`-gram shingle stream per source (no DISTINCT — the
    * sketch dedups internally).
    */
  private def shingles(docs: DataFrame, sources: Seq[String], n: Int): DataFrame =
    docs.where(col("source").isin(sources: _*))
      .select(col("source"), split(col("text"), " ").as("toks"))
      .where(size(col("toks")) >= n)
      .select(col("source"), explode(expr(
        s"transform(sequence(1, size(toks) - ${n - 1}), i -> array_join(slice(toks, i, $n), ' '))"))
        .as("sh"))

  /** One-pass per-source KMV sketch table: `(source, sk)`. */
  def sourceSketches(docs: DataFrame, sources: Seq[String],
                     n: Int = 3, k: Int = 1024): DataFrame = {
    val kmv = udaf(new KmvSketch.KmvAgg(k), KmvSketch.longEncoder)
    shingles(docs, sources, n).groupBy("source").agg(kmv(xxhash64(col("sh"))).as("sk"))
  }

  /** [[sourceSketches]] persisted under the IndexStore lifecycle
    * (sidecar-signed params + corpus signature, rebuild on drift) —
    * the sketch table is the INDEX artifact: built once at ingest,
    * loaded by every later overlap / rollup question, extended for a
    * delta batch by [[appendToSourceSketches]] in O(delta).
    */
  def loadOrBuildSourceSketches(docs: DataFrame, sources: Seq[String],
                                n: Int, k: Int, indexPath: String,
                                rebuild: Boolean = false): DataFrame =
    IndexStore.loadOrBuild(docs,
      s"kmv:n=$n,k=$k,sources=${sources.sorted.mkString("+")}",
      indexPath, rebuild) {
      sourceSketches(docs, sources, n, k)
    }

  /** O(delta) index append: sketch ONLY the delta batch, then merge
    * with the stored sketch table ([[graft.functions.KmvSketch.KmvMergeAgg]]).
    * Merge-of-merges == build-of-everything (KmvSketchProps' concat
    * law), so the appended index is bit-identical to a full rebuild —
    * pinned in SketchOpsSpec.
    */
  def appendToSourceSketches(stored: DataFrame, deltaDocs: DataFrame,
                             sources: Seq[String], n: Int, k: Int): DataFrame = {
    val mergeAgg = udaf(new KmvSketch.KmvMergeAgg(k), KmvSketch.longArray)
    stored.unionByName(sourceSketches(deltaDocs, sources, n, k))
      .groupBy("source").agg(mergeAgg(col("sk")).as("sk"))
  }

  def sourceOverlapCertified(docs: DataFrame, sources: Seq[String],
                             n: Int = 3, k: Int = 1024): DataFrame =
    overlapCertified(docs, sourceSketches(docs, sources, n, k), sources, n, k)

  /** [[sourceOverlapCertified]] answered from the PERSISTED sketch
    * index — the production shape: the corpus scan happened once at
    * index build; every subsequent overlap question reads
    * |sources| × ~8 KiB of sketches. Same certified output, same
    * oracle row.
    */
  def sourceOverlapCertifiedIndexed(docs: DataFrame, sources: Seq[String],
                                    n: Int, k: Int, indexPath: String): DataFrame =
    overlapCertified(docs,
      loadOrBuildSourceSketches(docs, sources, n, k, indexPath), sources, n, k)

  private def overlapCertified(docs: DataFrame, sketchDf: DataFrame,
                               sources: Seq[String], n: Int, k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    val sh = shingles(docs, sources, n)
    val sketchRows = sketchDf.collect() // bounded: ≤ |sources| rows × (k+1) longs
    val byName = sketchRows.map(r =>
      r.getString(0) -> KmvSketch.inflate(r.getAs[scala.collection.Seq[Long]]("sk").toArray, k)).toMap

    val ordered = sources.sorted
    val est = (for {
      a <- ordered; b <- ordered if a < b
      sa <- byName.get(a); sb <- byName.get(b)
    } yield {
      val (u, i) = KmvSketch.pairEstimates(sa, sb)
      (a, b, u, i)
    }).toDF("src_a", "src_b", "est_union", "est_inter")

    // exact anchor: distinct shingle sets, pairwise-joined
    val dist = sh.distinct()
    val perSrc = dist.groupBy("source").agg(count(lit(1)).as("n_src"))
    val inter = dist.as("a")
      .join(dist.as("b"),
        col("a.sh") === col("b.sh") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("n_inter"))
    val exact = inter
      .join(broadcast(perSrc.toDF("src_a", "n_a")), "src_a")
      .join(broadcast(perSrc.toDF("src_b", "n_b")), "src_b")
      .withColumn("n_union", col("n_a") + col("n_b") - col("n_inter"))

    val rootK = math.sqrt(k.toDouble)
    exact.join(broadcast(est), Seq("src_a", "src_b"))
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
        col("n_inter"), col("n_union"),
        (abs(col("est_union") - col("n_union")) <=
          col("n_union") * lit(6.0 / rootK) + lit(4.0)).cast("int").as("union_ok"),
        (abs(col("est_inter") - col("n_inter")) <=
          sqrt(col("n_inter") * col("n_union") / lit(k.toDouble)) * lit(6.0) +
            col("n_inter") * lit(6.0 / rootK) + lit(4.0)).cast("int").as("inter_ok"))
      .orderBy(col("src_a"), col("src_b"))
  }

  /** Pre-aggregated HLL rollup: distinct-text counts per source,
    * answered by MERGING per-(source, lang) sketches instead of
    * re-aggregating raw rows — the "sketch once at ingest grain,
    * roll up for free" pattern. At 100 TB the fine-grain sketch table
    * is sources × langs × ~2^lgK bytes (a few MB), and ANY coarser
    * rollup (per source, per lang, global) is a union over it with
    * zero raw-data scans; the second-level `hll_union_agg` here is
    * that rollup. Exact `countDistinct` beside it is the oracle
    * anchor; `within_bound` certifies the estimate inside
    * max(4, 5%·exact) — generous vs the ~0.8% rsd of lgK=14
    * registers, so the verdict is deterministic in practice.
    */
  def hllRollupCertified(docs: DataFrame, lgK: Int = 14): DataFrame = {
    val fine = docs.groupBy(col("source"), col("lang"))
      .agg(hll_sketch_agg(col("text"), lgK).as("sk"))
    val coarse = fine.groupBy(col("source"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
    val exact = docs.groupBy(col("source")).agg(countDistinct(col("text")).as("n_texts"))
    exact.join(coarse, "source")
      .select(col("source"), col("n_texts"),
        (abs(col("est") - col("n_texts")) <=
          greatest(lit(4.0), col("n_texts") * lit(0.05))).cast("int").as("within_bound"))
      .orderBy(col("source"))
  }

  /** Retention-curve primitive: per-day distinct users AND the running
    * cumulative distinct-user count, both sketch-estimated and
    * certified against exact anchors.
    *
    * The naive cumulative formulation re-scans the raw events once per
    * prefix — O(days × data). Here the per-day HLL sketches are built
    * in ONE map-side-combined pass over the events; the cumulative
    * series then merges the per-day KiB register blocks in an
    * expanding window over DAY rows, so the window's frame holds days
    * (~365 rows/year), never events — at 100 TB the raw data is
    * touched exactly once however long the retention horizon grows.
    * Exact anchors: per-day `countDistinct` and the first-seen-day
    * cumulative sum (a user contributes to `n_cum` from the day they
    * first appear — `sum(n_new) OVER (ORDER BY day)` ≡ cumulative
    * distinct, an identity the oracle replays).
    */
  def cumulativeDistinctUsersCertified(events: DataFrame, lgK: Int = 14): DataFrame = {
    val byDay = events.select(to_date(col("ts")).as("day"), col("user_id"))
    val daySk = byDay.groupBy(col("day"))
      .agg(hll_sketch_agg(col("user_id"), lgK).as("sk"))
    // expanding union over the tiny per-day sketch table (days rows)
    val wDays = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val est = daySk.select(col("day"),
      hll_sketch_estimate(col("sk")).as("est_daily"),
      hll_sketch_estimate(hll_union_agg(col("sk")).over(wDays)).as("est_cum"))
    val exactDaily = byDay.distinct()
      .groupBy(col("day")).agg(count(lit(1)).as("n_daily"))
    val firstSeen = byDay.groupBy(col("user_id")).agg(min(col("day")).as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("n_new"))
    val exact = exactDaily.join(firstSeen, Seq("day"), "left")
      .select(col("day"), col("n_daily"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
      .withColumn("n_cum", sum(col("n_new")).over(wDays))
    exact.join(est, "day")
      .select(col("day"), col("n_daily"), col("n_new"), col("n_cum"),
        (abs(col("est_daily") - col("n_daily")) <=
          greatest(lit(4.0), col("n_daily") * lit(0.05))).cast("int").as("daily_ok"),
        (abs(col("est_cum") - col("n_cum")) <=
          greatest(lit(4.0), col("n_cum") * lit(0.05))).cast("int").as("cum_ok"))
      .orderBy(col("day"))
  }
}
