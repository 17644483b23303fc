package graft.dfw

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC apply: merge a change feed into a base snapshot.
  *
  * Extension family M — the ingestion-maintenance shape a continuously
  * refreshed training corpus needs: upstream crawls/labelers emit
  * insert/update/delete events against document keys, and the corpus
  * table must converge to latest-state (or keep a queryable history)
  * without driver-side state or a per-key file rewrite pass. The
  * reference has no incremental story at all (it re-reads whole `.mat`
  * snapshots, `tools.py` load path); this family is what replaces that
  * full-reload habit at scale.
  */
object MergeOps {

  /** Last-writer-wins CDC merge.
    *
    * Per key: the change row with the highest `versionCol` wins; a key
    * with no change keeps its base row; a winning row whose `opCol`
    * equals `deleteOp` removes the key. Versions must be unique per key
    * (CDC logs give a monotone LSN/offset); base rows sit below every
    * change at version `Long.MinValue`.
    *
    * Scale shape: tag base, UNION the feed (no join), then ONE hash
    * aggregate keyed on `key` with `max_by(struct(payload), version)`.
    * The aggregate partial-combines map-side, so each task reduces its
    * local rows to at most one candidate per key before the single
    * shuffle; no Window (a window would shuffle AND sort whole groups
    * to pick one row), no driver state. This is the latest-wins half of
    * MERGE INTO as Delta/Iceberg execute it at 100 TB, decoupled from
    * file rewrite (layout is the sink's job — [[graft.sources.Sinks]]).
    *
    * @param base     current snapshot: `key` + payload columns
    * @param changes  feed with `key`, payload columns, `versionCol`, `opCol`
    */
  def applyChangesLww(base: DataFrame, changes: DataFrame, key: String,
                      versionCol: String, opCol: String,
                      deleteOp: String = "delete"): DataFrame = {
    val payload = base.columns.filterNot(_ == key).toSeq
    require(payload.forall(changes.columns.contains),
      s"changes feed must carry every base payload column; missing " +
        payload.filterNot(changes.columns.contains).mkString(", "))
    val baseTagged = base.select(
      (col(key) +: payload.map(col)) :+
        lit(Long.MinValue).as(versionCol) :+ lit("__base").as(opCol): _*)
    latestState(
      applyChangesLwwVersioned(baseTagged, changes, key, versionCol, opCol),
      versionCol, opCol, deleteOp)
  }

  /** The ASSOCIATIVE form of [[applyChangesLww]]: per-key winner
    * retained WITH its version and op — deletes stay as tombstones.
    *
    * Why it exists: a streaming/incremental maintainer that dropped
    * tombstones would lose the delete's version, and a later-arriving
    * but LOWER-version change would resurrect the key — violating the
    * batch-replay semantics. Retaining (version, op) makes the merge a
    * semilattice join (argmax by version), so
    * `merge(merge(s, b1), b2) == merge(s, b1 ∪ b2)` for any batch
    * split — the law [[graft.streaming.StreamOps.cdcApplyStream]]
    * builds on and MergeOpsSpec pins.
    *
    * Inputs carry identical columns: `key`, payload, `versionCol`,
    * `opCol`. Same single-shuffle plan as [[applyChangesLww]].
    */
  def applyChangesLwwVersioned(state: DataFrame, changes: DataFrame, key: String,
                               versionCol: String, opCol: String): DataFrame = {
    val payload = state.columns.filterNot(c =>
      c == key || c == versionCol || c == opCol).toSeq
    val cols = (col(key) +: payload.map(col)) :+
      col(versionCol).cast("long").as(versionCol) :+ col(opCol)
    val winner = state.select(cols: _*)
      .unionByName(changes.select(cols: _*))
      .groupBy(col(key))
      .agg(max_by(struct((payload ++ Seq(versionCol, opCol)).map(col): _*),
        col(versionCol)).as("__w"))
    winner.select(
      col(key) +: (payload ++ Seq(versionCol, opCol)).map(c => col(s"__w.$c").as(c)): _*)
  }

  /** Read view of a versioned state: live rows only, bookkeeping
    * columns dropped. */
  def latestState(versioned: DataFrame, versionCol: String, opCol: String,
                  deleteOp: String = "delete"): DataFrame =
    versioned.filter(col(opCol) =!= deleteOp).drop(versionCol, opCol)

  /** SCD-2 history: expand a change feed into validity intervals.
    *
    * Per key ordered by `versionCol`: `valid_from` = the change's own
    * version, `valid_to` = the next change's version (null while
    * current), `is_current` = 1 on the open interval. Rows whose op is
    * `deleteOp` close the previous interval but emit no open row (the
    * entity ends); a later insert for the same key re-opens it.
    *
    * Scale shape: one keyed Window whose groups are a single entity's
    * edit chain — bounded by per-key churn, not table width — so the
    * per-group sort stays small however wide the corpus is. The
    * partition key is the entity id: 100 TB of history still shuffles
    * once, and AQE's skew split covers a pathological hot entity.
    */
  def scdHistory(changes: DataFrame, key: String, versionCol: String,
                 opCol: String, deleteOp: String = "delete"): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(versionCol))
    changes
      .withColumn("valid_to", lead(col(versionCol), 1).over(w))
      .filter(col(opCol) =!= deleteOp)
      .withColumn("is_current", col("valid_to").isNull.cast("int"))
      .withColumn("valid_from", col(versionCol).cast("long"))
      .withColumn("valid_to", col("valid_to").cast("long"))
      .drop(versionCol)
  }

  /** Partial-aggregate state for incremental (materialized-view)
    * maintenance: keys + `cnt` + the named integer sums. The stored
    * grain IS the merge algebra — counts and sums are associative, so
    * a later [[mergePartials]] of this table with a delta's partials
    * equals recomputing from all raw rows (averages and variances
    * derive from (cnt, Σx, Σx²) at read time).
    *
    * @param sums (name, integer column) pairs; quantize doubles to a
    *             fixed grid BEFORE passing (micro-units) — double
    *             sums are order-dependent and break the
    *             merge-equals-recompute contract
    */
  def aggPartials(rows: DataFrame, keyCols: Seq[String],
                  sums: Seq[(String, Column)]): DataFrame = {
    require(sums.nonEmpty, "at least one sum column")
    rows.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        sums.map { case (n, c) => sum(c).as(n) }: _*)
  }

  /** Fold a delta's partials into stored aggregate state: UNION +
    * one re-aggregate summing every non-key column. This is the
    * refresh step a daily pipeline runs instead of a full recompute —
    * the scan cost is |state partials| + |delta rows-as-partials|,
    * independent of how much history the state already summarizes
    * (the point at 100 TB: day 365 costs the same as day 2). Both
    * inputs must share the [[aggPartials]] schema.
    */
  def mergePartials(state: DataFrame, delta: DataFrame,
                    keyCols: Seq[String]): DataFrame = {
    val valueCols = state.columns.filterNot(keyCols.contains)
    require(valueCols.nonEmpty, "state has no value columns to merge")
    state.unionByName(delta)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col(valueCols.head)).as(valueCols.head),
        valueCols.tail.map(c => sum(col(c)).as(c)): _*)
  }
}
