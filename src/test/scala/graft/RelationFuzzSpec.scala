package graft

import graft.search.JsonDsl
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Generative drill for the relational query faces — has_child /
  * has_parent (left-semi over a named relation) and nested
  * (exists-one-element over array-of-struct) — against independent
  * Scala folds. The generator plants the adversarial shapes: parents
  * with zero children, children of several parents' keys, NULL struct
  * fields inside elements, empty and NULL element arrays, and random
  * bool trees (must / must_not / should) whose three-valued-logic
  * corners are exactly where element predicates silently drift (a
  * must_not over a NULL field must match the element — set
  * complement per element, the Lucene inner-doc semantics).
  */
class RelationFuzzSpec extends SparkSpec {

  private val tagVals = Vector("red", "green", "blue", "amber", null)

  test("has_child / has_parent == left-semi reference folds, random inner queries") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(0x4a5c41dL)
    (1 to 8).foreach { ci =>
      val nP = 30 + rnd.nextInt(40)
      val parents = Seq.tabulate(nP)(i => (i.toLong, rnd.nextInt(50)))
      // ~20% of child rows key to parents that don't exist (orphans)
      val children = Seq.tabulate(60 + rnd.nextInt(80)) { j =>
        val pid = if (rnd.nextInt(5) == 0) (nP + rnd.nextInt(10)).toLong else rnd.nextInt(nP).toLong
        (1000L + j, pid, rnd.nextInt(50), tagVals(rnd.nextInt(4)))
      }
      val pDf = parents.toDF("pid", "pnum").repartition(1 + rnd.nextInt(4))
      val cDf = children.toDF("cid", "parent_id", "cnum", "ctag").repartition(1 + rnd.nextInt(4))

      // has_child: parents with >= 1 child matching the inner query
      val useTerm = rnd.nextBoolean()
      val cut = rnd.nextInt(40)
      val tag = tagVals(rnd.nextInt(4))
      val innerC = if (useTerm) s"""{"term": {"ctag": {"value": "$tag"}}}"""
                   else s"""{"range": {"cnum": {"gte": $cut}}}"""
      val hcBody =
        s"""{"query": {"has_child": {"type": "child_rel", "join": {"parent": "pid", "child": "parent_id"},
           |  "query": $innerC}}, "sort": [{"pid": "asc"}]}""".stripMargin
      val gotHc = JsonDsl
        .parse(pDf, hcBody, relations = Map("child_rel" -> cDf))
        .select("pid")
        .as[Long]
        .collect()
        .toSeq
      val matchingC = children.filter { case (_, _, cnum, ctag) =>
        if (useTerm) ctag == tag else cnum >= cut
      }
      val wantHc = parents.map(_._1).filter(p => matchingC.exists(_._2 == p)).sorted
      assert(gotHc == wantHc, s"corpus $ci: has_child mismatch (inner=$innerC)")

      // has_parent: children whose parent matches the inner query
      val pcut = rnd.nextInt(40)
      val hpBody =
        s"""{"query": {"has_parent": {"parent_type": "parent_rel", "join": {"parent": "pid", "child": "parent_id"},
           |  "query": {"range": {"pnum": {"lt": $pcut}}}}}, "sort": [{"cid": "asc"}]}""".stripMargin
      val gotHp = JsonDsl
        .parse(cDf, hpBody, relations = Map("parent_rel" -> pDf))
        .select("cid")
        .as[Long]
        .collect()
        .toSeq
      val matchingP = parents.filter(_._2 < pcut).map(_._1).toSet
      val wantHp = children.filter(c => matchingP.contains(c._2)).map(_._1).sorted
      assert(gotHp == wantHp, s"corpus $ci: has_parent mismatch (pcut=$pcut)")
    }
  }

  // --- nested: random predicate trees over array-of-struct elements ---

  private case class Elem(qty: Option[Int], tag: Option[String])

  /** Random nested predicate: (json, element evaluator). The evaluator
    * returns strict boolean "element satisfies" — term/range on a NULL
    * field are false, must_not is the complement of satisfied-true.
    */
  private def genPred(rnd: scala.util.Random, depth: Int): (String, Elem => Boolean) =
    if (depth == 0) rnd.nextInt(5) match {
      case 0 =>
        val t = tagVals(rnd.nextInt(4))
        (s"""{"term": {"items.tag": {"value": "$t"}}}""", e => e.tag.contains(t))
      case 1 =>
        val vs = Seq.fill(1 + rnd.nextInt(3))(tagVals(rnd.nextInt(4))).distinct
        (s"""{"terms": {"items.tag": [${vs.map(v => s""""$v"""").mkString(",")}]}}""",
         e => e.tag.exists(vs.contains))
      case 2 =>
        val lo = rnd.nextInt(30); val hi = lo + rnd.nextInt(30)
        (s"""{"range": {"items.qty": {"gte": $lo, "lte": $hi}}}""",
         e => e.qty.exists(q => q >= lo && q <= hi))
      case 3 => ("""{"exists": {"field": "items.tag"}}""", e => e.tag.isDefined)
      case _ => ("""{"match_all": {}}""", _ => true)
    }
    else rnd.nextInt(3) match {
      case 0 => // must + must_not
        val (m1, f1) = genPred(rnd, depth - 1)
        val (m2, f2) = genPred(rnd, depth - 1)
        (s"""{"bool": {"must": [$m1], "must_not": [$m2]}}""", e => f1(e) && !f2(e))
      case 1 => // pure should
        val (s1, f1) = genPred(rnd, depth - 1)
        val (s2, f2) = genPred(rnd, depth - 1)
        (s"""{"bool": {"should": [$s1, $s2]}}""", e => f1(e) || f2(e))
      case _ => // must pair
        val (m1, f1) = genPred(rnd, depth - 1)
        val (m2, f2) = genPred(rnd, depth - 1)
        (s"""{"bool": {"must": [$m1, $m2]}}""", e => f1(e) && f2(e))
    }

  test("nested: exists-one-element over random bool trees, NULL fields and empty arrays") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(0xe57edL)
    (1 to 10).foreach { ci =>
      val docs = Seq.tabulate(50 + rnd.nextInt(80)) { i =>
        val items: Option[Seq[Elem]] =
          if (rnd.nextInt(12) == 0) None
          else Some(Seq.fill(rnd.nextInt(5))(Elem(
            if (rnd.nextInt(6) == 0) None else Some(rnd.nextInt(60)),
            Option(tagVals(rnd.nextInt(tagVals.size)))
          )))
        (i.toLong, items)
      }
      val df: DataFrame = docs
        .map { case (id, items) =>
          (id, items.map(_.map(e => (e.qty.map(Int.box).orNull, e.tag.orNull))).orNull)
        }
        .toDF("id", "items")
        .select(
          col("id"),
          when(col("items").isNotNull,
            transform(col("items"), x => struct(x.getField("_1").cast("int").as("qty"), x.getField("_2").as("tag"))))
            .as("items")
        )
        .repartition(1 + rnd.nextInt(4))

      val (pred, eval) = genPred(rnd, rnd.nextInt(3))
      val body = s"""{"query": {"nested": {"path": "items", "query": $pred}}, "sort": [{"id": "asc"}]}"""
      val got = JsonDsl.parse(df, body).select("id").as[Long].collect().toSeq
      val want = docs.filter { case (_, items) => items.exists(_.exists(eval)) }.map(_._1).sorted
      assert(got == want, s"corpus $ci: nested mismatch for $pred")
    }
  }
}
