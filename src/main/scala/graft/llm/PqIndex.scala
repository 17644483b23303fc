package graft.llm

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/** Generic persisted-index lifecycle: round-trip any index DataFrame
  * through parquet with a `_graft_meta.json` sidecar holding an opaque
  * parameter string plus the corpus row count, and rebuild only when
  * either changes (or on an explicit force). The same
  * load-don't-rebuild contract as [[IvfIndex]], factored so every new
  * index family (PQ codebooks here; future graph/HNSW-style tables)
  * gets the 100 TB lifecycle for free instead of a session cache.
  *
  * All file I/O goes through the Hadoop FileSystem API, so `indexPath`
  * can be local, HDFS, or object storage.
  *
  * Concurrency contract: SINGLE WRITER. Index builds are out-of-band
  * maintenance jobs; two concurrent builders of the same `indexPath`,
  * or a reader racing a builder's parquet overwrite, see torn state —
  * same as any un-transactional table overwrite. The sidecar itself is
  * committed atomically (temp file + rename), so the worst a racing
  * reader observes is a MISSING sidecar (→ treated as stale →
  * rebuild), never a half-written one.
  */
private[llm] object IndexStore {

  private def metaPath(indexPath: String) = new Path(indexPath, "_graft_meta.json")

  private def fsFor(df: DataFrame, p: Path) =
    p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)

  /** Commit `content` to `p` atomically: write a unique temp sibling,
    * delete any previous `p`, rename temp → `p`. Rename is atomic on
    * HDFS and POSIX; the delete+rename pair can only expose "no
    * sidecar" (→ rebuild), never partial bytes.
    */
  private[llm] def writeAtomic(fs: org.apache.hadoop.fs.FileSystem, p: Path,
                               content: String): Unit = {
    val tmp = new Path(p.getParent,
      s".${p.getName}.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    val out = fs.create(tmp, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    fs.delete(p, false)
    if (!fs.rename(tmp, p))
      throw new java.io.IOException(s"IndexStore: failed to commit sidecar $p")
  }

  private def render(params: String, corpusCount: Long): String =
    s"""{"params":${quote(params)},"corpusCount":$corpusCount}"""

  private def quote(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Raw sidecar contents, if present. */
  def readMetaRaw(corpus: DataFrame, indexPath: String): Option[String] = {
    val p = metaPath(indexPath)
    val fs = fsFor(corpus, p)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(), StandardCharsets.UTF_8).trim)
      finally in.close()
    }
  }

  /** Load the persisted index at `indexPath`, or (re)build via
    * `build` when absent, stale (params or corpus count changed), or
    * forced. Returns the index read back from parquet, so every
    * caller runs against the same persisted artifact.
    *
    * Corpus row count is a deliberately cheap drift detector (parquet
    * metadata scan): appends/deletes trigger a rebuild, in-place row
    * edits do not — callers that mutate in place pass
    * `rebuild = true`.
    */
  def loadOrBuild(corpus: DataFrame, params: String, indexPath: String,
                  rebuild: Boolean)(build: => DataFrame): DataFrame = {
    val spark = corpus.sparkSession
    val fresh = render(params, corpus.count())
    val reuse = !rebuild && readMetaRaw(corpus, indexPath).contains(fresh)
    if (!reuse) {
      build.write.mode("overwrite").parquet(indexPath)
      val p = metaPath(indexPath)
      writeAtomic(fsFor(corpus, p), p, fresh)
    }
    spark.read.parquet(indexPath)
  }
}

/** Persisted lifecycle for PQ codebooks (SURVEY.md §2.8 X3): the
  * trained `(m, code, __cw, __cwn2)` table from
  * [[SimilarityOps.pqCodebooks]] is a corpus-wide artifact — build it
  * once, store it beside the corpus, and let every
  * [[SimilarityOps.pqEncode]]/[[SimilarityOps.pqTopK]] batch load it.
  * Encoded vectors themselves can additionally be persisted (they are
  * 32× smaller than the embeddings), but codes derive deterministically
  * from (codebooks, corpus), so the codebooks are the one artifact
  * whose loss forces retraining.
  */
object PqIndex {

  /** Load persisted codebooks, or (re)build when absent, stale
    * (parameters or corpus count changed), or forced.
    */
  def loadOrBuild(corpus: DataFrame, idCol: String, vecCol: String,
                  nSubspaces: Int, nCodes: Int, kmeansIters: Int,
                  indexPath: String, rebuild: Boolean = false): DataFrame =
    IndexStore.loadOrBuild(corpus,
      s"pq:nSubspaces=$nSubspaces,nCodes=$nCodes,kmeansIters=$kmeansIters",
      indexPath, rebuild) {
      SimilarityOps.pqCodebooks(corpus, idCol, vecCol, nSubspaces, nCodes, kmeansIters)
    }
}
