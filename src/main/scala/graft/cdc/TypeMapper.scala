package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Rule-driven source→target field mapping for snapshot/CDC sync — the
  * reference TDD's §4.3 transformation table
  * (aurora-postgresql-cdc-opensearchtdd.md:709-720) as a reusable
  * per-table mapper instead of hand-written per-table selects:
  *
  *   INTEGER/BIGINT → long · NUMERIC/DECIMAL → double ("precision may be
  *   lost") · VARCHAR/TEXT → keyword/text (kept as string) · BOOLEAN →
  *   boolean · TIMESTAMP → date (ISO 8601 string) · JSONB → object (the
  *   caller supplies `from_json` with its schema via an override) ·
  *   UUID → keyword · ARRAY → array (structure preserved).
  *
  * Everything compiles to one `select` of per-row expressions —
  * codegen-friendly, no shuffle, columns the target doesn't need never
  * leave the scan projection.
  */
object TypeMapper {

  /** ISO 8601 with millis, UTC — the `date` rendering OpenSearch stores. */
  val Iso8601: String = "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"

  /** Render an instant in true UTC regardless of the session timezone —
    * date_format alone renders session-local wall clock, which would stamp
    * a non-UTC time with the literal 'Z'. A zone-pinned java.time
    * formatter over the raw instant sidesteps session-timezone DST gaps
    * entirely (a to_utc_timestamp round-trip shifts instants whose UTC
    * wall clock falls in the session zone's spring-forward hole).
    */
  private val isoUtcUdf = udf((ts: java.sql.Timestamp) =>
    if (ts == null) null
    else
      java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
        .withZone(java.time.ZoneOffset.UTC)
        .format(ts.toInstant)
  )

  private def isoUtc(c: Column): Column = isoUtcUdf(c)

  /** The §4.3 rule for one source column, keyed by its Spark type. */
  def rule(dt: DataType): Column => Column = dt match {
    case ByteType | ShortType | IntegerType | LongType => _.cast(LongType)
    case FloatType | DoubleType | _: DecimalType       => _.cast(DoubleType)
    case TimestampType                                 => isoUtc
    case TimestampNTZType                              => c => date_format(c, Iso8601)
    case DateType                                      => c => date_format(c, "yyyy-MM-dd")
    case _                                             => identity // string/bool/array/struct pass through
  }

  /** Apply the rule table to every column of `df`, names unchanged. */
  def mapAll(df: DataFrame): DataFrame =
    df.select(df.schema.fields.map(f => rule(f.dataType)(col(f.name)).as(f.name)).toIndexedSeq: _*)

  /** Map a table into a target document shape:
    *   - `fields`: (sourceColumn, targetName) pairs, in output order; each
    *     gets the §4.3 rule for its source type unless overridden.
    *   - `overrides`: targetName → explicit expression (normalization,
    *     JSONB parsing, precision rounding ...). The override replaces the
    *     default rule entirely.
    *   - `extras`: derived target columns with no single source column.
    */
  def mapTable(
      df: DataFrame,
      fields: Seq[(String, String)],
      overrides: Map[String, Column] = Map.empty,
      extras: Seq[(String, Column)] = Nil
  ): DataFrame = {
    val byName = df.schema.fields.map(f => f.name -> f.dataType).toMap
    // Overrides apply to mapped fields only — extras already ARE explicit
    // expressions, so an override keyed on one is a mistake, not a layer.
    val targets = fields.map(_._2).toSet
    val unknown = overrides.keySet.diff(targets)
    require(unknown.isEmpty, s"overrides must name mapped field targets; unknown: ${unknown.mkString(", ")}")
    val mapped = fields.map { case (src, target) =>
      val dt = byName.getOrElse(src, throw new IllegalArgumentException(s"no source column '$src'"))
      overrides.getOrElse(target, rule(dt)(col(src))).as(target)
    }
    val derived = extras.map { case (name, c) => c.as(name) }
    df.select(mapped ++ derived: _*)
  }
}
