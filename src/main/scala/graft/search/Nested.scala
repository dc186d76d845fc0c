package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The `nested` field type: array-of-struct columns where a query clause
  * must hold on ONE element as a whole, not distributed across elements
  * (the object-vs-nested distinction — `{a:1,b:2},{a:2,b:1}` does NOT
  * match `a=1 AND b=1` when nested). Reference surface: the TDD's JSONB
  * mapping (aurora-postgresql-cdc-opensearch — tdd.md §4.3) emits
  * exactly such fields for document arrays.
  *
  * Spark-native shape: the nested document layout is ONE array-of-struct
  * column, so per-element matching is the `exists`/`filter` HOF pair over
  * it — a codegen'd per-row loop with no join, no explode, no shuffle at
  * query time. The layout itself is built once ([[nestedIndex]]) by a
  * (childKey) hash aggregation co-shuffled with the parent join — the
  * same one-time cost OpenSearch pays at indexing time, amortized over
  * every query. At 100 TB the build shuffles each child row exactly once
  * keyed by the parent id (no skew beyond the parent's natural fan-out),
  * and queries scan parent-sized data only.
  */
object Nested {

  /** Build the nested index shape: `parent` gains an array-of-struct
    * column `path` holding, per row, its `child` rows (the selected
    * `fields`). Element order is deterministic — sort_array orders by
    * the struct's fields in declaration order, so put the natural order
    * key (e.g. a line number) first in `fields`. Parents with no
    * children get an EMPTY array — the nested clause then correctly
    * never matches them (OpenSearch: absent nested docs match nothing),
    * while `exists(path)`-style presence checks stay well-defined.
    */
  def nestedIndex(
      parent: DataFrame,
      child: DataFrame,
      parentKey: String,
      childKey: String,
      path: String,
      fields: Seq[String]
  ): DataFrame = {
    require(fields.nonEmpty, "nested index needs at least one child field")
    val items = child
      .groupBy(col(childKey).as(parentKey))
      .agg(sort_array(collect_list(struct(fields.map(col): _*)), asc = true).as(path))
    val emptyItems = array().cast(items.schema(path).dataType)
    // Sort-merge, never broadcast, for the artifact attach (r19; guide
    // §3.1): the items side carries every child row packed into arrays —
    // at corpus scale it can NEVER broadcast, and even at bench scale
    // shipping the heavy arrays driver-side to build a hashed relation
    // measured ~35% slower than the merge join (3.77 vs 2.67 s per 3
    // builds, same instrument). The hint picks the strategy a 100 TB
    // build must use anyway; join semantics (and the artifact) unchanged.
    parent
      .join(items.hint("merge"), Seq(parentKey), "left")
      .withColumn(path, coalesce(col(path), emptyItems))
  }

  /** CDC maintenance for the nested artifact (the Bm25.applyDelta
    * precedent in array-of-struct form): child-level ops keyed by
    * (parent id, element ordinal) rewrite ONLY the touched parents'
    * element arrays. `delta` carries `op` ∈ {"u" upsert, "d" delete},
    * the parent id under `childKey`, and (for upserts) the element
    * `fields`; the FIRST field is the ordinal — the artifact's
    * sort key and the element's identity within its parent, so an
    * upsert of an existing ordinal replaces that element.
    *
    * Work is delta-sized: the delta aggregates to one row per touched
    * parent (ordinals to drop + structs to add — a map-side-combined
    * hash agg over the delta only), and the artifact left-joins it
    * id-keyed: the array surgery (filter + concat + sort_array) runs
    * only where the join matched; untouched parents stream through
    * with `path` unchanged. At 100 TB the artifact is id-bucketed, so
    * the join is bucket-local and the rewrite touches |delta|-many
    * buckets; AQE broadcasts the aggregated delta when it is small.
    * Children of parents absent from the artifact drop out with the
    * join (nested docs cannot exist without their parent — the
    * OpenSearch parent-routing rule).
    *
    * Op ordering WITHIN a delta: the per-parent aggregation is
    * set-shaped (drops ∪ adds), so two ops on the SAME (parent,
    * ordinal) in one delta would resolve op-order-insensitively (the
    * upsert always wins). Callers with multi-op deltas — a CDC
    * micro-batch carrying insert-then-delete for one element — MUST
    * pass `seqCol`, a monotone per-element sequence (Debezium LSN /
    * Kafka offset): the delta is first reduced to the LAST op per
    * (parent, ordinal) via one max_by aggregation, delta-sized like
    * everything else here. Without `seqCol` the single-op-per-element-
    * per-delta contract is the caller's to uphold.
    */
  def applyDelta(
      index: DataFrame,
      delta: DataFrame,
      parentKey: String,
      childKey: String,
      path: String,
      fields: Seq[String],
      opCol: String = "op",
      seqCol: Option[String] = None
  ): DataFrame = {
    require(fields.nonEmpty, "nested delta needs at least one child field (the ordinal)")
    val ordinal = fields.head
    // Multi-op deltas: keep only the last op per (parent, ordinal) —
    // max_by over the sequence column, one delta-sized aggregation.
    val reduced = seqCol.fold(delta) { sc =>
      val payload = struct((opCol +: fields.tail).map(col): _*)
      delta
        .groupBy(col(childKey), col(ordinal))
        .agg(max_by(payload, col(sc)).as("_last"))
        .select(
          col(childKey) +: col(ordinal) +:
            (opCol +: fields.tail).map(n => col(s"_last.$n").as(n)): _*
        )
    }
    // One row per touched parent: every delta'd ordinal drops (upsert
    // replaces, delete removes); upsert structs append. Op semantics are
    // the CDC contract: "d" deletes, ANY other op (Debezium c/u/r) is an
    // upsert — matching the reference consumer's apply rule and the
    // StreamingNested docstring.
    val perParent = reduced
      .groupBy(col(childKey).as(parentKey))
      .agg(
        collect_set(col(ordinal)).as("_drop"),
        collect_list(when(col(opCol) =!= "d", struct(fields.map(col): _*))).as("_adds")
      )
    // Cast target for the add-structs: the artifact's element type with
    // nullability RELAXED — the seqCol max_by reduction makes payload
    // fields nullable, and Spark refuses a nullable→non-null array cast.
    // Values are unchanged; only schema nullability loosens.
    def relax(dt: org.apache.spark.sql.types.DataType): org.apache.spark.sql.types.DataType = dt match {
      case org.apache.spark.sql.types.ArrayType(et, _) =>
        org.apache.spark.sql.types.ArrayType(relax(et), containsNull = true)
      case s: org.apache.spark.sql.types.StructType =>
        org.apache.spark.sql.types.StructType(
          s.fields.map(f => f.copy(dataType = relax(f.dataType), nullable = true)))
      case other => other
    }
    val itemsType = relax(index.schema(path).dataType)
    val emptyItems = array().cast(itemsType)
    index
      .join(perParent, Seq(parentKey), "left")
      .withColumn(
        path,
        when(col("_drop").isNull, col(path)).otherwise(
          sort_array(
            concat(
              filter(col(path), x => !array_contains(col("_drop"), x.getField(ordinal))),
              coalesce(col("_adds").cast(itemsType), emptyItems)
            ),
            asc = true
          )
        )
      )
      .drop("_drop", "_adds")
  }

  /** The `nested` query predicate: SOME element satisfies the whole
    * inner clause. One codegen'd loop per row.
    */
  def query(items: Column, pred: Column => Column): Column = exists(items, pred)

  /** The `inner_hits` payload for a matched document: the elements that
    * satisfied the clause, in stored order.
    */
  def innerHits(items: Column, pred: Column => Column): Column = filter(items, pred)

  /** The `nested` aggregation (metrics form): element count + the
    * exact-decimal mean of one element field over ALL nested elements.
    * Per-row partial aggregation — each parent row contributes its size
    * and a decimal HOF fold, so the element table is never exploded and
    * the shuffle carries two numbers per partition, not per element.
    */
  def nestedAgg(df: DataFrame, path: String, field: String, outName: String): DataFrame =
    df.select(
        size(col(path)).cast("long").as("_n"),
        expr(
          s"aggregate($path, CAST(0 AS DECIMAL(18,2)), " +
            s"(a, x) -> CAST(a + CAST(x.$field AS DECIMAL(18,2)) AS DECIMAL(18,2)))"
        ).as("_s")
      )
      .agg(
        sum(col("_n")).as("doc_count"),
        round(sum(col("_s")).cast("double") / sum(col("_n")), 6).as(outName)
      )
}
