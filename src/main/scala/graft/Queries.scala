package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.dfw.{SplitOps, TransformOps, GridOps, PermOps}

/** The engine's named queries and their DuckDB oracle SQL.
  *
  * Every query is a pure function of (SparkSession, sfDir) ending in an
  * explicit ORDER BY with full tiebreakers; the paired SQL mirrors the
  * semantics (and the IEEE arithmetic) exactly so the driver's
  * hash-compare passes. Column names are aliased identically on both
  * sides (the driver sorts columns by name before hashing).
  *
  * Float discipline: aggregates whose accumulation order could differ
  * between engines are rounded on BOTH sides; integer-valued doubles
  * (l_quantity) sum exactly in any order so they stay unrounded.
  */
object Queries {

  // ---------------------------------------------------------------
  // Shared fragments: the lineitem-as-feature-table mapping
  // (FIXTURES.md role mapping: cls = l_returnflag, deterministic
  // permutation key = multiplicative hash of the row key — same
  // arithmetic on both engines, no overflow: (999982*2654435761) < 2^63).
  // ---------------------------------------------------------------

  private val CV = 5

  private def featureTable(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem").select(
      col("l_returnflag").as("cls"),
      (col("l_orderkey") * 10 + col("l_linenumber")).as("sample_id"),
      (((col("l_orderkey") % 999983L) * 2654435761L + col("l_linenumber") * 40503L) % 1000000007L)
        .as("perm"),
      col("l_quantity"), col("l_extendedprice"))

  private val fSql =
    """SELECT l_returnflag AS cls,
      |       l_orderkey * 10 + l_linenumber AS sample_id,
      |       ((l_orderkey % 999983) * 2654435761 + l_linenumber * 40503) % 1000000007 AS perm,
      |       l_quantity, l_extendedprice
      |FROM lineitem""".stripMargin

  // The synthetic lineitem has duplicate (l_orderkey, l_linenumber)
  // pairs, so the rank ordering must be total over every projected
  // column or the two engines could swap tied rows.
  private def ranked(s: SparkSession, dir: String): DataFrame =
    SplitOps.rankByPermutation(featureTable(s, dir), Seq("cls"),
      Seq(col("perm"), col("sample_id"), col("l_quantity"), col("l_extendedprice")))

  private val rSql =
    s"""WITH f AS ($fSql),
       |r AS (SELECT *,
       |        row_number() OVER (PARTITION BY cls ORDER BY perm, sample_id, l_quantity, l_extendedprice) AS rn,
       |        count(*) OVER (PARTITION BY cls) AS n
       |      FROM f)""".stripMargin

  /** Round-half-to-even in portable SQL (Python builtin `round`,
    * reference preprocess.py:165). Must match SplitOps.roundHalfEven.
    */
  private def rheSql(x: String): String =
    s"(CASE WHEN $x - floor($x) = 0.5 THEN CAST(floor($x) AS BIGINT) + (CAST(floor($x) AS BIGINT) % 2)" +
      s" ELSE CAST(floor($x + 0.5) AS BIGINT) END)"

  /** Fractional train size with the reference's clamp (preprocess.py:164-167). */
  private def tsFracSql(n: String, f: String, cv: Int): String = {
    val s = rheSql(s"CAST($n AS DOUBLE) * $f")
    s"(CASE WHEN $s < $cv THEN LEAST($n, $cv) ELSE $s END)"
  }

  /** Integer train size with the reference's clamp (preprocess.py:168-171). */
  private def tsCountSql(n: String, k: String, cv: Int): String =
    s"(CASE WHEN LEAST($k, $n) < $cv THEN LEAST($cv, $n) ELSE LEAST($k, $n) END)"

  // ---------------------------------------------------------------
  // Query registry
  // ---------------------------------------------------------------

  /** Insertion-ordered so Verify/Bench output is stable. */
  val queries: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(

    // ---- headline aggregation (exercises scan + hash agg; T5-adjacent) ----
    ("q1_agg",
      (s: SparkSession, dir: String) => {
        Tables.load(s, dir, "lineitem")
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(col("l_quantity")).as("sum_qty"),
            round(sum(col("l_extendedprice")), 2).as("sum_base"),
            round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
            round(avg(col("l_quantity")), 6).as("avg_qty"),
            count(lit(1)).as("cnt"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  sum(l_quantity) AS sum_qty,
             |  round(sum(l_extendedprice), 2) AS sum_base,
             |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
             |  round(avg(l_quantity), 6) AS avg_qty,
             |  CAST(count(*) AS BIGINT) AS cnt
             |FROM lineitem GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // ---- W1/W2: per-class train/test split by stored permutation order ----
    ("w1_train_test",
      (s: SparkSession, dir: String) => {
        SplitOps.trainTestSplit(ranked(s, dir), SplitOps.Frac(0.5), CV)
          .select(col("cls"), col("sample_id"), col("role"))
          .orderBy(col("cls"), col("sample_id"), col("role"))
      },
      Some(s"""$rSql
              |SELECT cls, sample_id,
              |  CASE WHEN rn <= ${tsFracSql("n", "0.5", CV)} THEN 'train' ELSE 'test' END AS role
              |FROM r ORDER BY cls, sample_id, role""".stripMargin)),

    // ---- W2: train-size clamp semantics on small classes ----
    ("w2_train_clamp",
      (s: SparkSession, dir: String) => {
        val byCls = Tables.load(s, dir, "supplier")
          .groupBy(col("s_nationkey").as("cls")).agg(count(lit(1)).as("n"))
        byCls
          .withColumn("ts_all", SplitOps.trainSizeCol(col("n"), SplitOps.All, CV))
          .withColumn("ts_half", SplitOps.trainSizeCol(col("n"), SplitOps.Frac(0.5), CV))
          .withColumn("ts_fifth", SplitOps.trainSizeCol(col("n"), SplitOps.Frac(0.2), CV))
          .withColumn("ts_c3", SplitOps.trainSizeCol(col("n"), SplitOps.Count(3), CV))
          .withColumn("ts_cbig", SplitOps.trainSizeCol(col("n"), SplitOps.Count(1000000), CV))
          .orderBy(col("cls"))
      },
      Some(s"""WITH c AS (SELECT s_nationkey AS cls, count(*) AS n FROM supplier GROUP BY s_nationkey)
              |SELECT cls, n,
              |  n AS ts_all,
              |  ${tsFracSql("n", "0.5", CV)} AS ts_half,
              |  ${tsFracSql("n", "0.2", CV)} AS ts_fifth,
              |  ${tsCountSql("n", "3", CV)} AS ts_c3,
              |  ${tsCountSql("n", "1000000", CV)} AS ts_cbig
              |FROM c ORDER BY cls""".stripMargin)),

    // ---- W3: linspace K-fold assignment (train = all) ----
    ("w3_fold_linspace",
      (s: SparkSession, dir: String) => {
        SplitOps.linspaceFolds(ranked(s, dir).withColumn("train_n", col("n")), CV)
          .select(col("cls"), col("sample_id"), col("pos"), col("fold"))
          .orderBy(col("cls"), col("pos"))
      },
      Some(s"""$rSql
              |SELECT cls, sample_id, rn - 1 AS pos, CAST(g.fold AS INT) AS fold
              |FROM r, generate_series(0, ${CV - 1}) g(fold)
              |WHERE rn - 1 >= floor(g.fold * (CAST(n AS DOUBLE) / $CV))
              |  AND rn - 1 < CASE WHEN g.fold = ${CV - 1} THEN CAST(n AS DOUBLE)
              |                    ELSE floor((g.fold + 1) * (CAST(n AS DOUBLE) / $CV)) END
              |ORDER BY cls, pos""".stripMargin)),

    // ---- W4: rotation CV when train_size < cv ----
    ("w4_fold_rotation",
      (s: SparkSession, dir: String) => {
        val cust = Tables.load(s, dir, "customer").select(
          col("c_mktsegment").as("cls"),
          col("c_custkey").as("sample_id"),
          ((col("c_custkey") % 999983L) * 2654435761L % 1000000007L).as("perm"))
        val top3 = SplitOps.rankByPermutation(cust, Seq("cls"), Seq(col("perm"), col("sample_id")))
          .filter(col("rn") <= 3)
          .withColumn("train_n", lit(3L))
        SplitOps.rotationFolds(top3, CV)
          .select(col("cls"), col("sample_id"), col("pos"), col("fold"), col("cv_role"))
          .orderBy(col("cls"), col("fold"), col("pos"))
      },
      Some(s"""WITH c AS (SELECT c_mktsegment AS cls, c_custkey AS sample_id,
              |              ((c_custkey % 999983) * 2654435761) % 1000000007 AS perm FROM customer),
              |r AS (SELECT *, row_number() OVER (PARTITION BY cls ORDER BY perm, sample_id) AS rn FROM c),
              |t AS (SELECT cls, sample_id, rn - 1 AS pos FROM r WHERE rn <= 3)
              |SELECT cls, sample_id, pos, CAST(g.fold AS INT) AS fold,
              |  CASE WHEN pos = g.fold % 3 THEN 'test' ELSE 'train' END AS cv_role
              |FROM t, generate_series(0, ${CV - 1}) g(fold)
              |ORDER BY cls, fold, pos""".stripMargin)),

    // ---- W5: cross-class offset accumulation (running-sum window) ----
    ("w5_offset",
      (s: SparkSession, dir: String) => {
        val perClass = SplitOps.trainTestSplit(ranked(s, dir), SplitOps.Frac(0.5), CV)
          .groupBy(col("cls")).agg(max(col("train_size")).as("train_size"))
        SplitOps.classOffsets(perClass, "cls", "train_size")
          .select(col("cls"), col("train_size"), col("offset"))
          .orderBy(col("cls"))
      },
      Some(s"""$rSql,
              |p AS (SELECT cls, max(${tsFracSql("n", "0.5", CV)}) AS train_size FROM r GROUP BY cls)
              |SELECT cls, train_size,
              |  COALESCE(sum(train_size) OVER (ORDER BY cls ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS offset
              |FROM p ORDER BY cls""".stripMargin)),

    // ---- T2/J4: leak-free train-mean centering ----
    ("t2_center",
      (s: SparkSession, dir: String) => {
        val split = SplitOps.trainTestSplit(ranked(s, dir), SplitOps.Frac(0.5), CV)
        TransformOps.centerByTrainMean(split, Seq("cls"), "role", Seq("l_quantity", "l_extendedprice"))
          .select(col("cls"), col("sample_id"), col("role"),
            col("l_quantity_centered").as("qty_c"),
            round(col("l_extendedprice_centered"), 4).as("price_c"))
          .orderBy(col("cls"), col("sample_id"), col("role"), col("qty_c"), col("price_c"))
      },
      Some(s"""$rSql,
              |s AS (SELECT *, CASE WHEN rn <= ${tsFracSql("n", "0.5", CV)} THEN 'train' ELSE 'test' END AS role FROM r),
              |m AS (SELECT cls, avg(l_quantity) AS m_qty, avg(l_extendedprice) AS m_price
              |      FROM s WHERE role = 'train' GROUP BY cls)
              |SELECT s.cls, s.sample_id, s.role,
              |  s.l_quantity - m.m_qty AS qty_c,
              |  round(s.l_extendedprice - m.m_price, 4) AS price_c
              |FROM s JOIN m ON s.cls = m.cls
              |ORDER BY s.cls, s.sample_id, s.role, qty_c, price_c""".stripMargin))
  )

  def queryMap: Map[String, (SparkSession, String) => DataFrame] =
    queries.map { case (n, f, _) => n -> f }.toMap

  def oracleMap: Map[String, String] =
    queries.collect { case (n, _, Some(sql)) => n -> sql }.toMap
}
