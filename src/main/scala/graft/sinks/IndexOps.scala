package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Index-management operations over file-backed indices — the OpenSearch
  * management APIs the reference deployment relies on
  * (`_reindex`, `_delete_by_query`, `_update_by_query`,
  * `_cat/indices`-style stats), as idempotent batch rewrites.
  *
  * Every op is read → transform → full overwrite of the target index:
  * deterministic, replayable, and embarrassingly parallel (the same model
  * OpenSearch implements with scroll+bulk under the hood, minus the
  * version-conflict bookkeeping an immutable rewrite makes unnecessary).
  * Documents keep their `_id`; transforms must preserve it.
  */
object IndexOps {

  /** `_reindex` with an optional transform (field mapping / filtering):
    * copy src into dst applying `transform`. Returns dst doc count.
    */
  def reindex(
      spark: SparkSession,
      root: String,
      src: String,
      dst: String,
      transform: DataFrame => DataFrame = identity
  ): Long = {
    val docs = transform(IndexFileSink.readIndex(spark, root, src))
    require(docs.columns.contains("_id"), "reindex transform must preserve _id")
    IndexFileSink.indexBatch(docs, root, dst, "_id")
    IndexFileSink.readIndex(spark, root, dst).count()
  }

  /** Rewrite an index via write-to-temp + atomic directory swap. The new
    * contents stream straight from the old files to the temp dir — nothing
    * is pinned in executor memory (the previous localCheckpoint pivot
    * materialized the whole index, a non-starter at 100 TB) and the path
    * being read is never the path being written. The swap is two cheap
    * filesystem metadata ops.
    */
  private def indexFs(spark: SparkSession, root: String) =
    new org.apache.hadoop.fs.Path(root).getFileSystem(spark.sessionState.newHadoopConf())

  /** Restore an index stranded mid-swap by a crash: if the live directory
    * is missing but the moved-aside copy exists, rename it back. Called by
    * every rewrite op before reading, so an interrupted swap heals on the
    * next invocation instead of requiring a hand-rename.
    */
  def recoverSwap(spark: SparkSession, root: String, index: String): Boolean = {
    val fs = indexFs(spark, root)
    val cur = new org.apache.hadoop.fs.Path(root, index)
    val old = new org.apache.hadoop.fs.Path(root, s"$index.__old")
    if (!fs.exists(cur) && fs.exists(old)) {
      require(fs.rename(old, cur), s"swap recovery failed: $old -> $cur")
      true
    } else false
  }

  /** CONCURRENCY CONTRACT (applies to every rewrite op — `_reindex`,
    * `deleteByQuery`, `updateByQuery`): single writer, no concurrent
    * readers during the swap. The two-rename swap has a window where the
    * live path does not exist; [[recoverSwap]] heals a crash inside it, but
    * a reader (or a second rewrite) racing the window fails on a missing
    * path. This mirrors the reference's posture — OpenSearch `_reindex`
    * into a live alias is likewise an external-coordination problem — and
    * on a real deployment the swap is guarded by the orchestrator (one
    * writer per index) exactly as Debezium guarantees one consumer per
    * topic-partition.
    */
  private def rewrite(spark: SparkSession, root: String, index: String, docs: DataFrame): Unit = {
    val tmpName = s"$index.__rewrite"
    IndexFileSink.indexBatch(docs, root, tmpName, "_id")
    val fs = indexFs(spark, root)
    val cur = new org.apache.hadoop.fs.Path(root, index)
    val tmp = new org.apache.hadoop.fs.Path(root, tmpName)
    val old = new org.apache.hadoop.fs.Path(root, s"$index.__old")
    // Swap order matters: move the live index ASIDE first so a crash
    // between the metadata ops never leaves zero copies — the data
    // survives under .__old and [[recoverSwap]] restores it on the next
    // op against this index.
    fs.delete(old, true)
    require(fs.rename(cur, old), s"swap failed moving live index aside: $cur -> $old")
    require(fs.rename(tmp, cur), s"swap failed: $tmp -> $cur (previous contents preserved at $old)")
    fs.delete(old, true)
  }

  /** `_delete_by_query`: drop matching docs, rewrite the index. Returns
    * the number deleted.
    */
  def deleteByQuery(spark: SparkSession, root: String, index: String, predicate: Column): Long = {
    recoverSwap(spark, root, index)
    val docs = IndexFileSink.readIndex(spark, root, index)
    // One pass: the deleted-count rides the rewrite scan as an observed
    // metric (the observe node sits before the filter, so it sees every
    // row) instead of a second full read of the index.
    val observed = docs
      .observe("graft_dbq", sum(when(coalesce(predicate, lit(false)), 1L).otherwise(0L)).as("n"))
      .filter(!coalesce(predicate, lit(false)))
    val (_, metric) = org.apache.spark.sql.graft.PlanBridge
      .withObservedMetric(spark, "graft_dbq")(rewrite(spark, root, index, observed))
    metric
      .map(r => if (r.isNullAt(0)) 0L else r.getLong(0))
      .getOrElse(throw new IllegalStateException("delete_by_query metric was not delivered"))
  }

  /** `_update_by_query`: apply column updates to matching docs. Returns
    * the number of matched docs.
    */
  def updateByQuery(
      spark: SparkSession,
      root: String,
      index: String,
      predicate: Column,
      updates: Map[String, Column]
  ): Long = {
    recoverSwap(spark, root, index)
    val docs = IndexFileSink.readIndex(spark, root, index)
    // Same single-pass shape as deleteByQuery: matched-count observed
    // during the rewrite, not via a separate count() read.
    val base = docs.observe("graft_ubq", sum(when(predicate, 1L).otherwise(0L)).as("matched"))
    val updated = updates.foldLeft(base) { case (d, (name, value)) =>
      d.withColumn(name, when(predicate, value).otherwise(col(name)))
    }
    val (_, metric) = org.apache.spark.sql.graft.PlanBridge
      .withObservedMetric(spark, "graft_ubq")(rewrite(spark, root, index, updated))
    metric
      .map(r => if (r.isNullAt(0)) 0L else r.getLong(0))
      .getOrElse(throw new IllegalStateException("update_by_query metric was not delivered"))
  }

  /** Age-based retention (TDD §3.5.3 lifecycle "delete" state) over a
    * [[PartitionedStore]] calendar layout: drop partition directories whose
    * `p_bucket` value sorts strictly before `cutoffBucket` (same pattern as
    * the writer, e.g. "2024-03"). Deleting whole partitions is the
    * scale-safe retirement idiom — directory metadata ops, zero data
    * rewrite, and readers prune the dropped range the same way the query
    * path does. Returns the retired bucket values.
    */
  def retire(spark: SparkSession, path: String, cutoffBucket: String): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) Seq.empty
    else {
      val expired = fs
        .listStatus(root)
        .filter(_.isDirectory)
        .map(_.getPath)
        .filter { p =>
          p.getName.startsWith("p_bucket=") &&
          p.getName.stripPrefix("p_bucket=") < cutoffBucket
        }
      expired.foreach(fs.delete(_, true))
      expired.map(_.getName.stripPrefix("p_bucket=")).toSeq.sorted
    }
  }

  /** ILM "delete" phase for rolled generations: drop whole aged-out index
    * directories (the [[rollover]] read side stays a pattern over the
    * survivors). Directory metadata ops only — zero data rewrite, the
    * same scale-safe idiom as [[retire]]'s partition drops. Returns the
    * indices actually removed.
    */
  def retireIndices(spark: SparkSession, root: String, indices: Seq[String]): Seq[String] = {
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    indices.filter { ix =>
      val p = new org.apache.hadoop.fs.Path(rootPath, ix)
      fs.exists(p) && fs.delete(p, true)
    }
  }

  /** Resolve an OpenSearch-style index pattern (`*transaction*`, `card*`)
    * against the indices that exist under `root` — directory-listing
    * metadata only, no data I/O. Returns matching index names sorted.
    */
  def resolvePattern(spark: SparkSession, root: String, pattern: String): Seq[String] = {
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(rootPath)) Seq.empty
    else {
      val regex = ("^" + java.util.regex.Pattern.quote(pattern).replace("*", "\\E.*\\Q") + "$").r
      fs.listStatus(rootPath)
        .filter(_.isDirectory)
        .map(_.getPath.getName)
        .filter(n => regex.findFirstIn(n).isDefined)
        .toSeq
        .sorted
    }
  }

  /** An alias: a queryable view over one or more indices with an optional
    * filter (OpenSearch filtered aliases — the standard multi-tenant /
    * time-slice access path). Purely logical: the filter lands in the scan
    * of each member index like any pushed predicate.
    */
  def aliasView(
      spark: SparkSession,
      root: String,
      indices: Seq[String],
      filter: Option[Column] = None
  ): DataFrame = {
    require(indices.nonEmpty, "alias needs at least one index")
    val unioned = indices.map(IndexFileSink.readIndex(spark, root, _)).reduce(_ unionByName _)
    filter.fold(unioned)(unioned.filter)
  }
  /** `_rollover`: when the alias's current write index holds at least
    * `maxDocs` documents, the NEXT numbered index (`<alias>-000002`, ...)
    * becomes the write target — OpenSearch's size-capped index rolling,
    * the write side of an ILM policy (the read side stays a pattern/alias
    * over every generation, and [[retire]] ages the old ones out).
    *
    * Returns (current write index, rolled: whether a new one was cut).
    * The count is one narrow aggregate over the current index only —
    * never the whole alias family.
    */
  def rollover(spark: SparkSession, root: String, alias: String, maxDocs: Long): (String, Boolean) = {
    val gens = resolvePattern(spark, root, s"$alias-*")
    require(gens.nonEmpty, s"no write index for alias '$alias' — create '${alias}-000001' first")
    val current = gens.max // zero-padded names sort chronologically
    // A freshly rolled index has no documents yet — schema inference over
    // an empty JSON dir is an AnalysisException, which here just means 0.
    val docs =
      try IndexFileSink.readIndex(spark, root, current).count()
      catch { case _: org.apache.spark.sql.AnalysisException => 0L }
    if (docs < maxDocs) (current, false)
    else {
      val gen = current.stripPrefix(s"$alias-").toInt + 1
      val next = f"$alias-$gen%06d"
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root, next))
      (next, true)
    }
  }

  def catIndices(spark: SparkSession, root: String, indices: Seq[String]): DataFrame = {
    val frames = indices.map { ix =>
      IndexFileSink
        .readIndex(spark, root, ix)
        .agg(count(lit(1)).as("docs_count"))
        .select(lit(ix).as("index"), col("docs_count"))
    }
    frames.reduce(_ unionByName _).orderBy("index")
  }
}
