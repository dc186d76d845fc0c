package graft

import graft.search.{IndexMapping, JsonDsl}
import org.apache.spark.sql.functions._

/** Generative drill for the mutation APIs — _update_by_query,
  * _delete_by_query, _reindex. Random query predicates (term / range /
  * match_all over nullable fields) × random ctx._source scripts
  * (1–2 sequential assignments of integer-exact arithmetic, so the
  * assignment's cast-to-column-type is deterministic to mirror) ×
  * random _source projections. The reference folds each request over
  * the corpus: 3VL query match, statements applied IN ORDER (a later
  * statement sees the earlier result), RHS cast to the target column's
  * type (double→int truncates toward zero, Spark cast semantics).
  */
class MutationApiFuzzSpec extends SparkSpec {

  private val tagVals = Vector("red", "blue", "green", "plum")

  private case class Doc(id: Long, tag: Option[String], price: Option[Double], qty: Option[Int])

  private val docs: Vector[Doc] = {
    val rnd = new scala.util.Random(0x300fL)
    Vector.tabulate(200) { i =>
      Doc(
        i.toLong,
        if (rnd.nextInt(8) == 0) None else Some(tagVals(rnd.nextInt(tagVals.size))),
        if (rnd.nextInt(8) == 0) None else Some(rnd.nextInt(500).toDouble), // integer-valued: script math exact
        if (rnd.nextInt(8) == 0) None else Some(rnd.nextInt(50))
      )
    }
  }

  private lazy val frame = {
    val s = spark
    import s.implicits._
    docs
      .map(d => (d.id, d.tag.orNull, d.price.map(Double.box).orNull, d.qty.map(Int.box).orNull))
      .toDF("_id", "tag", "price", "qty")
      .select(col("_id"), col("tag"), col("price").cast("double").as("price"), col("qty").cast("int").as("qty"))
      .cache()
  }

  private val mapping = IndexMapping(Map("tag" -> "keyword"))

  // ── request model ───────────────────────────────────────────────────
  private sealed trait Q
  private case object All extends Q
  private case class TagEq(v: String) extends Q
  private case class QtyGte(v: Int) extends Q

  private case class Stmt(target: String, a: String, op: Char, k: Int) // target = a op k

  private def genQ(rnd: scala.util.Random): Q = rnd.nextInt(3) match {
    case 0 => All
    case 1 => TagEq(tagVals(rnd.nextInt(tagVals.size)))
    case 2 => QtyGte(rnd.nextInt(40))
  }

  private def genStmts(rnd: scala.util.Random): Seq[Stmt] =
    Seq.fill(1 + rnd.nextInt(2)) {
      val target = if (rnd.nextBoolean()) "price" else "qty"
      val src = if (rnd.nextBoolean()) "price" else "qty"
      Stmt(target, src, if (rnd.nextBoolean()) '+' else '*', 1 + rnd.nextInt(5))
    }

  private def renderQ(q: Q): String = q match {
    case All => """{"match_all": {}}"""
    case TagEq(v) => s"""{"term": {"tag": {"value": "$v"}}}"""
    case QtyGte(v) => s"""{"range": {"qty": {"gte": $v}}}"""
  }

  private def renderScript(ss: Seq[Stmt]): String =
    ss.map(s => s"ctx._source.${s.target} = ${s.a} ${s.op} ${s.k}").mkString("; ")

  // ── reference ───────────────────────────────────────────────────────
  private def matches(q: Q, d: Doc): Boolean = q match {
    case All => true
    case TagEq(v) => d.tag.contains(v)
    case QtyGte(v) => d.qty.exists(_ >= v)
  }

  /** state as Option[Double] per numeric field; assignment casts back to
    * the TARGET column's type (qty: double→int truncation).
    */
  private def applyStmts(ss: Seq[Stmt], d: Doc): (Option[Double], Option[Int]) =
    ss.foldLeft((d.price, d.qty)) { case ((p, q), st) =>
      val src: Option[Double] = if (st.a == "price") p else q.map(_.toDouble)
      val rhs = src.map(v => if (st.op == '+') v + st.k else v * st.k)
      if (st.target == "price") (rhs, q) else (p, rhs.map(_.toInt))
    }

  test("40 random update_by_query requests: post-update frame == reference fold") {
    val rnd = new scala.util.Random(0x300f1L)
    (1 to 40).foreach { ci =>
      val q = genQ(rnd)
      val ss = genStmts(rnd)
      val body = s"""{"query": ${renderQ(q)}, "script": {"source": "${renderScript(ss)}"}}"""
      val got = JsonDsl
        .updateByQuery(frame, body, mapping)
        .collect()
        .map(r =>
          (r.getLong(r.fieldIndex("_id")),
           Option(r.get(r.fieldIndex("price"))).map(_.toString.toDouble),
           Option(r.get(r.fieldIndex("qty"))).map(_.toString.toInt))
        )
        .toSet
      val want = docs.filter(matches(q, _)).map { d =>
        val (p2, q2) = applyStmts(ss, d)
        (d.id, p2, q2)
      }.toSet
      assert(got == want, s"#$ci <$body>: extra=${(got -- want).take(3)} missing=${(want -- got).take(3)}")
    }
  }

  test("20 random delete_by_query requests: ledger == counts") {
    val rnd = new scala.util.Random(0x300f2L)
    (1 to 20).foreach { ci =>
      val q = genQ(rnd)
      val body = s"""{"query": ${renderQ(q)}}"""
      val r = JsonDsl.deleteByQuery(frame, body, mapping).collect()(0)
      val wantDel = docs.count(matches(q, _))
      assert(
        r.getLong(0) == wantDel && r.getLong(1) == docs.size - wantDel && r.getLong(2) == docs.size,
        s"#$ci <$body>: ${r.toSeq} want ($wantDel, ${docs.size - wantDel}, ${docs.size})"
      )
    }
  }

  test("20 random reindex requests: dest content == filter + project + script fold") {
    val rnd = new scala.util.Random(0x300f3L)
    (1 to 20).foreach { ci =>
      val q = genQ(rnd)
      val withScript = rnd.nextBoolean()
      val ss = if (withScript) genStmts(rnd).filter(s => s.target == "price" && s.a == "price") else Nil
      val sourceSel = if (rnd.nextBoolean()) Some(Seq("price")) else None
      val scriptPart =
        if (ss.nonEmpty) s""", "script": {"source": "${renderScript(ss)}"}""" else ""
      val srcSelPart = sourceSel.map(cs => s""", "_source": [${cs.map(c => s""""$c"""").mkString(",")}]""").getOrElse("")
      val body =
        s"""{"source": {"index": "docs", "query": ${renderQ(q)}$srcSelPart}, "dest": {"index": "docs_v2"}$scriptPart}"""
      val gotDf = JsonDsl.reindex(frame, "_id", body, mapping)
      val got = gotDf
        .collect()
        .map { r =>
          val p = Option(r.get(r.fieldIndex("price"))).map(_.toString.toDouble)
          (r.getLong(r.fieldIndex("_id")), p)
        }
        .toSet
      val want = docs.filter(matches(q, _)).map { d =>
        val p = if (ss.nonEmpty) applyStmts(ss, d)._1 else d.price
        (d.id, p)
      }.toSet
      assert(got == want, s"#$ci <$body>: extra=${(got -- want).take(3)} missing=${(want -- got).take(3)}")
      if (sourceSel.isDefined)
        assert(gotDf.columns.toSet == Set("_id", "price"), s"#$ci: projection leaked ${gotDf.columns.toSeq}")
    }
  }
}
