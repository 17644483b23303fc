package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.dfw.{SplitOps, TransformOps, GridOps, PermOps, SliceOps}

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
              |ORDER BY s.cls, s.sample_id, s.role, qty_c, price_c""".stripMargin)),

    // ---- P1: 1-based inclusive class-range slice ----
    ("p1_class_range",
      (s: SparkSession, dir: String) => {
        SliceOps.classRange(
          Tables.loadColumns(s, dir, "embeddings", Seq("vec_id", "label")), "label", (3, 7))
          .orderBy(col("vec_id"))
      },
      Some("SELECT vec_id, label FROM embeddings WHERE label BETWEEN 2 AND 6 ORDER BY vec_id")),

    // ---- P2: label-entry drop (intended semantics of the reference's dead flag) ----
    ("p2_label_drop",
      (s: SparkSession, dir: String) => {
        Tables.load(s, dir, "embeddings").select(
          col("vec_id"),
          size(SliceOps.dropLabelEntry(col("embedding"), labeled = true)).cast("long").as("n_after"),
          expr("CAST(element_at(embedding, size(embedding) - 1) AS DOUBLE)").as("last_kept"))
          .orderBy(col("vec_id"))
      },
      Some("""SELECT vec_id, CAST(len(embedding) - 1 AS BIGINT) AS n_after,
             |  CAST(embedding[len(embedding) - 1] AS DOUBLE) AS last_kept
             |FROM embeddings ORDER BY vec_id""".stripMargin)),

    // ---- J1: permutation gather (equi-join against one trial of a stored permutation) ----
    ("j1_perm_gather",
      (s: SparkSession, dir: String) => {
        val o = Tables.load(s, dir, "orders").select(
          col("o_orderpriority").as("cls"), col("o_orderkey").as("sample_id"), col("o_totalprice"))
        val trials = s.range(3).select(col("id").cast("int").as("trial"))
        val perm = o.select("cls", "sample_id").crossJoin(broadcast(trials))
          .withColumn("h",
            ((col("sample_id") % 999983L) * (lit(2654435761L) + col("trial") * 1000003L) + col("trial")) % 1000000007L)
          .withColumn("pos",
            (row_number().over(Window.partitionBy(col("cls"), col("trial"))
              .orderBy(col("h"), col("sample_id"))) - 1).cast("long"))
          .select("cls", "trial", "pos", "sample_id")
        PermOps.gather(o, perm, Seq("cls"), "sample_id", trial = 1)
          .select(col("cls"), col("pos"), col("sample_id"), col("o_totalprice"))
          .orderBy(col("cls"), col("pos"))
      },
      Some("""WITH o AS (SELECT o_orderpriority AS cls, o_orderkey AS sample_id, o_totalprice FROM orders),
             |p AS (SELECT cls, sample_id, g.trial,
             |        row_number() OVER (PARTITION BY cls, g.trial
             |          ORDER BY ((sample_id % 999983) * (2654435761 + g.trial * 1000003) + g.trial) % 1000000007, sample_id) - 1 AS pos
             |      FROM o, generate_series(0, 2) g(trial))
             |SELECT o.cls, p.pos, o.sample_id, o.o_totalprice
             |FROM o JOIN p ON o.cls = p.cls AND o.sample_id = p.sample_id AND p.trial = 1
             |ORDER BY o.cls, p.pos""".stripMargin)),

    // ---- J2: MATLAB 1-based permutation-index normalization ----
    ("j2_index_norm",
      (s: SparkSession, dir: String) => {
        val o = Tables.load(s, dir, "orders").select(
          col("o_orderpriority").as("cls"), col("o_orderkey").as("sample_id"),
          ((col("o_orderkey") % 999983L) * 2654435761L % 1000000007L).as("h"))
        val r = SplitOps.rankByPermutation(o, Seq("cls"), Seq(col("h"), col("sample_id")))
        val mixed = r.withColumn("pos_val",
          when(col("cls").isin("1-URGENT", "2-HIGH"), col("rn")).otherwise(col("rn") - 1))
        PermOps.normalizeIndices(mixed, Seq("cls"), "pos_val")
          .select(col("cls"), col("sample_id"), col("pos_val"))
          .orderBy(col("cls"), col("pos_val"))
      },
      Some("""WITH o AS (SELECT o_orderpriority AS cls, o_orderkey AS sample_id,
             |             ((o_orderkey % 999983) * 2654435761) % 1000000007 AS h FROM orders),
             |r AS (SELECT cls, sample_id,
             |        row_number() OVER (PARTITION BY cls ORDER BY h, sample_id) AS rn,
             |        count(*) OVER (PARTITION BY cls) AS n FROM o),
             |p AS (SELECT cls, sample_id, n,
             |        CASE WHEN cls IN ('1-URGENT', '2-HIGH') THEN rn ELSE rn - 1 END AS pos_val FROM r)
             |SELECT cls, sample_id,
             |  CASE WHEN max(pos_val) OVER (PARTITION BY cls) = n THEN pos_val - 1 ELSE pos_val END AS pos_val
             |FROM p ORDER BY cls, pos_val""".stripMargin)),

    // ---- J3: hyperparameter grid in kron order ----
    ("j3_grid",
      (s: SparkSession, dir: String) =>
        GridOps.grid(s, Seq(Seq(0.1, 1.0), Seq(2.0), Seq(3.0, 4.0, 5.0))).orderBy(col("combo_id")),
      Some("""WITH p1(i1, v1) AS (VALUES (0, 0.1), (1, 1.0)),
             |p2(i2, v2) AS (VALUES (0, 2.0)),
             |p3(i3, v3) AS (VALUES (0, 3.0), (1, 4.0), (2, 5.0))
             |SELECT CAST(i1 * 3 + i2 * 3 + i3 AS BIGINT) AS combo_id,
             |  CAST(v1 AS DOUBLE) AS p1, CAST(v2 AS DOUBLE) AS p2, CAST(v3 AS DOUBLE) AS p3
             |FROM p1, p2, p3 ORDER BY combo_id""".stripMargin)),

    // ---- T1: bias extension ----
    ("t1_extend",
      (s: SparkSession, dir: String) => {
        val f = featureTable(s, dir)
          .withColumn("fe", TransformOps.extendBias(array(col("l_quantity"), col("l_extendedprice"))))
        f.select(col("cls"), col("sample_id"),
            size(col("fe")).cast("long").as("n_feat"),
            element_at(col("fe"), -1).as("f_last"),
            col("l_quantity").as("f1"), col("l_extendedprice").as("f2"))
          .orderBy(col("cls"), col("sample_id"), col("f1"), col("f2"))
      },
      Some(s"""WITH f AS ($fSql),
              |e AS (SELECT cls, sample_id, l_quantity, l_extendedprice,
              |        [l_quantity, l_extendedprice, CAST(1.0 AS DOUBLE)] AS fe FROM f)
              |SELECT cls, sample_id, CAST(len(fe) AS BIGINT) AS n_feat, fe[-1] AS f_last,
              |  l_quantity AS f1, l_extendedprice AS f2
              |FROM e ORDER BY cls, sample_id, f1, f2""".stripMargin)),

    // ---- T5: class counting ----
    ("t5_class_count",
      (s: SparkSession, dir: String) => {
        val li = TransformOps.classCount(Tables.load(s, dir, "lineitem"), Nil, "l_returnflag")
          .withColumn("tbl", lit("lineitem"))
        val sup = TransformOps.classCount(Tables.load(s, dir, "supplier"), Nil, "s_nationkey")
          .withColumn("tbl", lit("supplier"))
        TransformOps.unionAll(Seq(li, sup)).select("tbl", "class_num").orderBy("tbl")
      },
      Some("""SELECT 'lineitem' AS tbl, count(DISTINCT l_returnflag) AS class_num FROM lineitem
             |UNION ALL
             |SELECT 'supplier' AS tbl, count(DISTINCT s_nationkey) AS class_num FROM supplier
             |ORDER BY tbl""".stripMargin)),

    // ---- T6: schema-aligned union ----
    ("t6_union",
      (s: SparkSession, dir: String) => {
        val c = Tables.load(s, dir, "customer")
          .select(col("c_name").as("name"), col("c_acctbal").as("acctbal"), lit("customer").as("src"))
        val sup = Tables.load(s, dir, "supplier")
          .select(col("s_name").as("name"), col("s_acctbal").as("acctbal"), lit("supplier").as("src"))
        TransformOps.unionAll(Seq(c, sup)).orderBy(col("src"), col("name"), col("acctbal"))
      },
      Some("""SELECT c_name AS name, c_acctbal AS acctbal, 'customer' AS src FROM customer
             |UNION ALL
             |SELECT s_name AS name, s_acctbal AS acctbal, 'supplier' AS src FROM supplier
             |ORDER BY src, name, acctbal""".stripMargin)),

    // ---- T7: deterministic delimiter-join per group ----
    ("t7_string_join",
      (s: SparkSession, dir: String) => {
        Tables.load(s, dir, "supplier")
          .groupBy(col("s_nationkey").as("cls"))
          .agg(TransformOps.stringJoinAgg(col("s_name"), ",").as("names"))
          .orderBy(col("cls"))
      },
      Some("""SELECT s_nationkey AS cls, string_agg(s_name, ',' ORDER BY s_name) AS names
             |FROM supplier GROUP BY s_nationkey ORDER BY cls""".stripMargin)),

    // ---- join menu: broadcast multi-join with top-k (TPC-H Q3 shape) ----
    ("q3_top_revenue",
      (s: SparkSession, dir: String) => {
        val c = Tables.load(s, dir, "customer")
          .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
        val o = Tables.load(s, dir, "orders").select("o_orderkey", "o_custkey")
        val l = Tables.load(s, dir, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount")
        broadcast(c).join(o, c("c_custkey") === o("o_custkey"))
          .join(l, o("o_orderkey") === l("l_orderkey"))
          .groupBy(col("o_orderkey"))
          .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
          .orderBy(col("revenue").desc, col("o_orderkey"))
          .limit(10)
      },
      Some("""SELECT o.o_orderkey, round(sum(l.l_extendedprice * (1.0 - l.l_discount)), 2) AS revenue
             |FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
             |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
             |WHERE c.c_mktsegment = 'BUILDING'
             |GROUP BY o.o_orderkey ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin)),

    // ---- join menu: left semi (EXISTS) ----
    ("j_semi",
      (s: SparkSession, dir: String) => {
        val c = Tables.load(s, dir, "customer")
        val urgent = Tables.load(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
        c.join(urgent, c("c_custkey") === urgent("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
             |ORDER BY c_custkey""".stripMargin)),

    // ---- join menu: left anti (NOT EXISTS) ----
    ("j_anti",
      (s: SparkSession, dir: String) => {
        val o = Tables.load(s, dir, "orders")
        val returned = Tables.load(s, dir, "lineitem").filter(col("l_returnflag") === "R")
        o.join(returned, o("o_orderkey") === returned("l_orderkey"), "left_anti")
          .select(col("o_orderkey"), col("o_totalprice"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
             |ORDER BY o_orderkey""".stripMargin)),

    // ---- join menu: range (theta) join against a literal band table ----
    ("j_range",
      (s: SparkSession, dir: String) => {
        val bands = s.createDataFrame(Seq(
          ("low", 0.0, 10.0), ("mid", 10.0, 100.0), ("high", 100.0, 1000000.0)))
          .toDF("band", "lo", "hi")
        Tables.load(s, dir, "events")
          .join(broadcast(bands), col("value") >= col("lo") && col("value") < col("hi"))
          .groupBy(col("band"))
          .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
          .orderBy(col("band"))
      },
      Some("""WITH b(band, lo, hi) AS (VALUES
             |  ('low', CAST(0 AS DOUBLE), CAST(10 AS DOUBLE)),
             |  ('mid', CAST(10 AS DOUBLE), CAST(100 AS DOUBLE)),
             |  ('high', CAST(100 AS DOUBLE), CAST(1000000 AS DOUBLE)))
             |SELECT band, CAST(count(*) AS BIGINT) AS n, round(sum(e.value), 4) AS sum_value
             |FROM events e JOIN b ON e.value >= b.lo AND e.value < b.hi
             |GROUP BY band ORDER BY band""".stripMargin)),

    // ---- X6 (batch form): tumbling time-window aggregation ----
    ("x6_tumbling_window",
      (s: SparkSession, dir: String) => {
        Tables.load(s, dir, "events")
          .groupBy(date_trunc("hour", col("ts")).as("ws"), col("event_type"))
          .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
          .orderBy(col("ws"), col("event_type"))
      },
      Some("""SELECT date_trunc('hour', ts) AS ws, event_type,
             |  CAST(count(*) AS BIGINT) AS n, round(sum(value), 4) AS sum_value
             |FROM events GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin))
  )

  def queryMap: Map[String, (SparkSession, String) => DataFrame] =
    queries.map { case (n, f, _) => n -> f }.toMap

  def oracleMap: Map[String, String] =
    queries.collect { case (n, _, Some(sql)) => n -> sql }.toMap
}
