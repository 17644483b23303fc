package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Write-side operators (SURVEY.md §2.1 S6 — the reference has no
  * sink at all; results die in driver memory at
  * `/root/reference/DFW/preprocess.py:86-89`). Parquet is the
  * canonical on-disk format; these helpers encode the layout
  * decisions that matter at 100 TB.
  */
object Sinks {

  /** Hive-style partitioned Parquet: one directory per distinct value
    * combination of `partitionCols`. Downstream readers get partition
    * PRUNING (a filter on a partition column skips whole directories)
    * — the right layout for low-cardinality keys that queries filter
    * on (class labels, dates, languages).
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).partitionBy(partitionCols: _*).parquet(path)

  /** Size-bounded Parquet files: repartition to `numFiles` before the
    * write so the sink neither produces thousands of tiny files (task
    * count) nor a few unsplittable giants. At cluster scale aim for
    * 128-512 MB per file.
    */
  def writeSized(df: DataFrame, path: String, numFiles: Int,
                 mode: SaveMode = SaveMode.Overwrite): Unit =
    df.repartition(numFiles).write.mode(mode).parquet(path)

  /** Bucketed catalog table: rows hash-bucketed (and optionally
    * sorted) by the join/aggregation key at WRITE time. Two tables
    * bucketed the same way join with NO exchange on either side — at
    * 100 TB that removes the dominant shuffle from every recurring
    * fact-to-fact join against the same key. Requires a catalog table
    * (bucket metadata lives in the metastore).
    */
  def writeBucketed(df: DataFrame, table: String, buckets: Int, keyCols: Seq[String],
                    mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .bucketBy(buckets, keyCols.head, keyCols.tail: _*)
      .sortBy(keyCols.head, keyCols.tail: _*)
      .saveAsTable(table)

  /** Partitioned AND clustered: directory partitioning on
    * `partitionCols` plus `repartition(keyCols)` so rows that join or
    * aggregate on `keyCols` land co-located within each partition's
    * files — reader-side shuffles start from key-local data.
    */
  def writeClustered(df: DataFrame, path: String, partitionCols: Seq[String],
                     keyCols: Seq[String], mode: SaveMode = SaveMode.Overwrite): Unit = {
    import org.apache.spark.sql.functions.col
    df.repartition(keyCols.map(col): _*)
      .write.mode(mode).partitionBy(partitionCols: _*).parquet(path)
  }

  /** JSON-Lines sink (corpus interchange, pairs with
    * [[Tables.loadJsonl]]): one JSON object per line, `numFiles`
    * bounded like [[writeSized]], optional gzip (splittable per FILE,
    * not within a file — keep files modest). Parquet stays the
    * canonical analytical format; JSONL is the handoff edge to
    * tokenizers/trainers that stream text.
    */
  def writeJsonl(df: DataFrame, path: String, numFiles: Int,
                 gzip: Boolean = false, mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.repartition(numFiles).write.mode(mode)
    (if (gzip) w.option("compression", "gzip") else w).json(path)
  }

  /** Export `(cls, features ARRAY<DOUBLE>)` rows back to the
    * reference's native `.mat` layout: variable `x` = one cell matrix
    * per class, rows ordered by `idCol` (graft.sources.mat.MatV5,
    * readable by `scipy.io.loadmat` and by the graft-mat source).
    *
    * DELIBERATELY driver-side: a `.mat` file is a single-machine
    * format — the reference itself holds everything in driver memory —
    * so this is the interop/export edge for model-fitting-sized
    * results, NOT a distributed sink. `maxRows` fail-fasts if someone
    * points it at table-scale data (write parquet instead).
    */
  def writeMat(df: DataFrame, path: String, clsCol: String = "cls",
               idCol: String = "sample_id", featuresCol: String = "features",
               maxRows: Long = 1000000L): Unit = {
    import org.apache.spark.sql.functions.col
    val rows = df.select(col(clsCol).cast("int"), col(idCol), col(featuresCol))
      .orderBy(col(clsCol), col(idCol))
      .collect()
    require(rows.length <= maxRows,
      s".mat export is driver-side and got ${rows.length} rows (max $maxRows) — write parquet for data at scale")
    val byCls = rows.groupBy(_.getInt(0)).toSeq.sortBy(_._1)
    require(byCls.nonEmpty, ".mat export of an empty DataFrame")
    val cells = byCls.map { case (_, rs) =>
      val mats = rs.map(_.getSeq[Double](2))
      val cols = mats.head.length
      require(mats.forall(_.length == cols), "ragged feature arrays in .mat export")
      graft.sources.mat.MatV5.Matrix(mats.length, cols, mats.flatten.toArray)
    }
    graft.sources.mat.MatV5.write(path, Seq("x" -> Right(cells)))
  }
}
