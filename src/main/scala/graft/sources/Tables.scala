package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Data sources (SURVEY.md §2.1, S1–S6).
  *
  * The reference loads MATLAB `.mat` files eagerly into driver memory
  * (`/root/reference/DFW/tools.py:58-79`); our engine scans Parquet
  * lazily through the DataSource V2 path, so predicate pushdown and
  * column pruning reach the file scan for free.
  */
object Tables {

  /** The driver-generated testdata tables (TESTDATA.md). */
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** S3: path templating — `{key}` substitution from a config map
    * (reference `tools.py:114-123`, `DatabaseStr.decode`). Only int,
    * long, float, double and string values are supported, mirroring
    * the reference's type check at `tools.py:118-119`.
    */
  def renderPath(template: String, vars: Map[String, Any]): String =
    vars.foldLeft(template) { case (s, (k, v)) =>
      v match {
        case _: Int | _: Long | _: Float | _: Double | _: String =>
          s.replace(s"{$k}", v.toString)
        case other =>
          throw new IllegalArgumentException(
            s"only int, float and str type supported, please check key $k (got ${other.getClass.getSimpleName})")
      }
    }

  /** S4: format-name normalization — strip any case-variant suffix and
    * re-append the canonical one (reference `preprocess.py:428-433`
    * does this for `.mat`; our canonical on-disk format is parquet).
    */
  def normalizeFormat(name: String, suffix: String = "parquet"): String =
    name.replaceAll("(?i)\\." + suffix + "$", "") + "." + suffix

  /** S1 + S5: scan with existence check. A missing file is a fatal
    * analysis error (reference `preprocess.py:398-399` exits; we throw).
    *
    * Session requirement: loading `events` needs
    * `spark.sql.legacy.parquet.nanosAsLong=true` in the session conf
    * (the file stores TIMESTAMP(NANOS); DSv2 honors this flag only at
    * the session level, not per-read). Sessions built via
    * [[graft.GraftSession.tuned]] have it set; any other session gets a
    * fail-fast `require` here rather than a mid-scan parquet error.
    * Earlier versions self-healed by mutating the caller's session
    * conf; the explicit requirement replaced that (behavior change).
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/${normalizeFormat(name)}"
    if (name == "events") {
      // events.parquet stores TIMESTAMP(NANOS); the session factory sets
      // spark.sql.legacy.parquet.nanosAsLong (GraftSession.tuned) so the
      // scan yields LongType nanos. Convert with integer division (a
      // double division would lose precision at ~1.7e18 ns). The option
      // below covers sessions not built via GraftSession: DSv2 honors
      // per-read options only through the session conf, so require it.
      require(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
        "events.parquet needs spark.sql.legacy.parquet.nanosAsLong=true — build the session via GraftSession.tuned")
      val raw = spark.read.parquet(path)
      raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    } else spark.read.parquet(path)
  }

  /** S2: variable/domain projection — read only the requested columns;
    * Catalyst `ColumnPruning` pushes this into the Parquet scan
    * (reference `tools.py:72-79` selects MAT variables after a full load).
    */
  def loadColumns(spark: SparkSession, dir: String, name: String, cols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.col
    load(spark, dir, name).select(cols.map(col): _*)
  }
}
