package graft

import graft.cdc.TypeMapper
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The TDD §4.3 rule-driven mapper: generic per-type conversion applied to
  * any table, with per-table renames/overrides on top.
  */
class TypeMapperSpec extends SparkSpec {
  import spark.implicits._

  test("rule table: integrals widen to long, decimals/floats to double, timestamps to ISO 8601") {
    val df = Seq((1, 2.5f, "x"))
      .toDF("i", "f", "s")
      .withColumn("ts", lit("2024-03-05 10:30:00").cast("timestamp"))
      .withColumn("d", lit("2024-03-05").cast("date"))
      .withColumn("dec", lit(BigDecimal("12.34")).cast(DecimalType(10, 2)))
    val out = TypeMapper.mapAll(df)
    val types = out.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("i") == LongType)
    assert(types("f") == DoubleType)
    assert(types("dec") == DoubleType)
    assert(types("s") == StringType)
    assert(types("ts") == StringType)
    val row = out.select("ts", "d", "dec").head()
    assert(row.getString(0) == "2024-03-05T10:30:00.000Z")
    assert(row.getString(1) == "2024-03-05")
    assert(row.getDouble(2) == 12.34)
  }

  test("a second table goes through the same mapper (orders -> order docs)") {
    val o = Tables.orders(spark, Sf)
    val docs = TypeMapper.mapTable(
      o,
      fields = Seq(
        "o_orderkey" -> "id",
        "o_orderdate" -> "order_date",
        "o_totalprice" -> "total",
        "o_orderstatus" -> "status"
      ),
      overrides = Map("status" -> lower(col("o_orderstatus")))
    )
    assert(docs.columns.toSeq == Seq("id", "order_date", "total", "status"))
    assert(docs.schema("id").dataType == LongType)
    assert(docs.schema("order_date").dataType == StringType)
    val r = docs.orderBy("id").head()
    // o_orderdate canonicalizes to DATE (Tables.withDate) whatever the
    // writer wrote, so the OpenSearch rendering is the plain date form,
    // not the timestamp ISO form.
    assert(r.getAs[String]("order_date").matches("""\d{4}-\d{2}-\d{2}"""))
    assert(docs.count() == o.count())
  }

  test("JSONB-style columns map to objects via a from_json override") {
    val e = Tables.events(spark, Sf)
    val docs = TypeMapper.mapTable(
      e,
      fields = Seq("event_id" -> "id", "props" -> "props"),
      overrides = Map("props" -> from_json(col("props"), StructType(Seq(StructField("k", IntegerType)))))
    )
    assert(docs.schema("props").dataType.isInstanceOf[StructType])
    assert(docs.filter(col("props.k").isNotNull).count() > 0)
  }

  test("unknown source columns fail fast") {
    intercept[IllegalArgumentException] {
      TypeMapper.mapTable(Tables.orders(spark, Sf), fields = Seq("nope" -> "x"))
    }
  }

  test("typo'd override keys fail fast instead of silently dropping the normalization") {
    intercept[IllegalArgumentException] {
      TypeMapper.mapTable(
        Tables.orders(spark, Sf),
        fields = Seq("o_orderkey" -> "id"),
        overrides = Map("Id" -> lower(col("o_orderkey")))
      )
    }
    // an override keyed on an extras column would be silently ignored -> reject
    intercept[IllegalArgumentException] {
      TypeMapper.mapTable(
        Tables.orders(spark, Sf),
        fields = Seq("o_orderkey" -> "id"),
        overrides = Map("flag" -> lit(true)),
        extras = Seq("flag" -> (col("o_totalprice") > 0))
      )
    }
  }

  test("UTC rendering is immune to the session zone and its DST gaps") {
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      // 2026-03-08T02:30:00Z falls inside New York's spring-forward hole;
      // a to_utc_timestamp round-trip would shift it to 03:30Z.
      val df = Seq("x").toDF("dummy").select(
        lit(java.sql.Timestamp.from(java.time.Instant.parse("2026-03-08T02:30:00Z"))).as("ts")
      )
      val out = TypeMapper.mapAll(df).select("ts").as[String].head()
      assert(out == "2026-03-08T02:30:00.000Z", out)
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }
}
