package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native percolator verification (r18): the bool.must / must_not /
  * should(msm=1) re-check over a candidate row's clause array and
  * per-field token arrays, as ONE compiled eval instead of the
  * interpreted forall/exists/phrase HOF tree it replaces (measured: the
  * HOF verification was ~1.1 s of search_percolate_indexed_rich's 1.6 s
  * at sf0.1 — ~37 µs per candidate row; interpreted HOFs on a
  * candidate-bound hot path are the classic 5-10× tax).
  *
  * Exact-equivalence contract with the retired HOF tree (PercolateSpec
  * tier-equality + PercolateFuzzSpec differential drills pin it):
  *   - hard clauses (kind or/and/phrase/not_*) must ALL hold; should_*
  *     clauses hold as a group when ≥1 holds (minimum_should_match=1);
  *     no shoulds → vacuously true.
  *   - 'or' = any clean term present; 'and' = all clean terms present
  *     (vacuously true when none survive cleaning); 'phrase' = clean
  *     terms adjacent in order within the field's full in-order token
  *     array; not_* negate their positive form. Cleaning drops
  *     null/empty terms — byte-identical to the HOF cleanTerms.
  *   - a clause addressing a field outside `fieldNames` is FALSE
  *     (negations included) — the foldRight-else-false dispatch.
  *   - a NULL token array makes the clause FALSE whatever its kind.
  *     (The HOF tree yields NULL there, which the enclosing filter
  *     drops exactly like FALSE — and inside the should-exists a NULL
  *     is absorbed by any true sibling just as FALSE is — so the kept
  *     row set is identical; this expression returns false/true only.)
  */
case class RichClausesOk(
    clauses: Expression,
    fieldNames: Seq[String],
    toksArrays: Seq[Expression]
) extends Expression with CodegenFallback {

  require(fieldNames.length == toksArrays.length, "one token array per field")

  override def children: Seq[Expression] = clauses +: toksArrays
  override def nullable: Boolean = false
  override def dataType: DataType = BooleanType
  override def prettyName: String = "rich_clauses_ok"

  override def checkInputDataTypes(): TypeCheckResult = {
    val clausesOk = clauses.dataType match {
      case ArrayType(StructType(fs), _) =>
        fs.map(f => f.name -> f.dataType).toMap.view
          .filterKeys(Set("field", "kind", "terms")).toMap ==
          Map("field" -> StringType, "kind" -> StringType,
            "terms" -> ArrayType(StringType, true)) ||
          (fs.length == 3 && fs(0).dataType == StringType && fs(1).dataType == StringType &&
            fs(2).dataType.isInstanceOf[ArrayType])
      case _ => false
    }
    val toksOk = toksArrays.forall(_.dataType match {
      case ArrayType(StringType, _) => true
      case _                        => false
    })
    if (clausesOk && toksOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<struct<field,kind,terms>> + array<string> token columns, got " +
        s"${clauses.dataType.catalogString} / ${toksArrays.map(_.dataType.catalogString)}")
  }

  // struct field positions resolved once from the schema, not per row
  @transient private lazy val (fieldIdx, kindIdx, termsIdx) = {
    val fs = clauses.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
    (fs.fieldIndex("field"), fs.fieldIndex("kind"), fs.fieldIndex("terms"))
  }
  @transient private lazy val fieldUtf8: Array[UTF8String] =
    fieldNames.map(UTF8String.fromString).toArray

  private def contains(toks: ArrayData, t: UTF8String): Boolean = {
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i) && toks.getUTF8String(i).equals(t)) return true
      i += 1
    }
    false
  }

  /** terms with null/empty entries dropped (the HOF cleanTerms). */
  private def clean(terms: ArrayData): Array[UTF8String] = {
    val n = terms.numElements()
    val out = new Array[UTF8String](n)
    var k = 0
    var i = 0
    while (i < n) {
      if (!terms.isNullAt(i)) {
        val t = terms.getUTF8String(i)
        if (t.numBytes() > 0) { out(k) = t; k += 1 }
      }
      i += 1
    }
    if (k == n) out else java.util.Arrays.copyOf(out, k)
  }

  private def anyIn(ts: Array[UTF8String], toks: ArrayData): Boolean = {
    var i = 0
    while (i < ts.length) { if (contains(toks, ts(i))) return true; i += 1 }
    false
  }

  private def allIn(ts: Array[UTF8String], toks: ArrayData): Boolean = {
    var i = 0
    while (i < ts.length) { if (!contains(toks, ts(i))) return false; i += 1 }
    true
  }

  /** clean terms adjacent in order somewhere in the full token array
    * (nulls inside toks never match — same as the HOF's === semantics).
    */
  private def phraseIn(ts: Array[UTF8String], toks: ArrayData): Boolean = {
    val n = ts.length
    if (n == 0) return false
    val m = toks.numElements()
    if (m < n) return false
    var i = 0
    val last = m - n
    while (i <= last) {
      if (!toks.isNullAt(i) && toks.getUTF8String(i).equals(ts(0))) {
        var j = 1
        var ok = true
        while (ok && j < n) {
          ok = !toks.isNullAt(i + j) && toks.getUTF8String(i + j).equals(ts(j))
          j += 1
        }
        if (ok) return true
      }
      i += 1
    }
    false
  }

  override def eval(input: InternalRow): Any = {
    val cls = clauses.eval(input)
    if (cls == null) return false
    val arr = cls.asInstanceOf[ArrayData]
    val toksByField = new Array[ArrayData](toksArrays.length)
    var f = 0
    while (f < toksArrays.length) {
      val v = toksArrays(f).eval(input)
      toksByField(f) = if (v == null) null else v.asInstanceOf[ArrayData]
      f += 1
    }
    val nc = arr.numElements()
    var hasShould = false
    var anyShould = false
    var i = 0
    while (i < nc) {
      val c = arr.getStruct(i, 3)
      val kind = c.getUTF8String(kindIdx)
      val kindS = kind.toString
      val isShould = kindS.startsWith("should_")
      // a false hard clause decides the row; a false should only counts
      if (!(isShould && anyShould)) {
        val field = c.getUTF8String(fieldIdx)
        var fi = -1
        var k = 0
        while (fi < 0 && k < fieldUtf8.length) {
          if (fieldUtf8(k).equals(field)) fi = k
          k += 1
        }
        val toks = if (fi < 0) null else toksByField(fi)
        val ok =
          if (toks == null) false // unknown field or null token array
          else {
            val ts = clean(c.getArray(termsIdx))
            kindS match {
              case "or" | "should_or"         => anyIn(ts, toks)
              case "and" | "should_and"       => allIn(ts, toks)
              case "phrase" | "should_phrase" => phraseIn(ts, toks)
              case "not_or"                   => !anyIn(ts, toks)
              case "not_and"                  => !allIn(ts, toks)
              case _                          => !phraseIn(ts, toks) // not_phrase + the HOF otherwise-branch
            }
          }
        if (isShould) { hasShould = true; anyShould ||= ok }
        else if (!ok) return false
      } else hasShould = true
      i += 1
    }
    !hasShould || anyShould
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(clauses = newChildren.head, toksArrays = newChildren.tail)
}

/** First-posted-term ownership, compiled (r18): TRUE iff `pterm` equals
  * the FIRST element of `posted` (in posted order) that is present in
  * `hits` — the exact row-local dedup
  * `pterm === element_at(array_intersect(posted, hits), 1)` computes,
  * without the per-row hash-set the interpreted ArrayIntersect builds
  * (posted is a handful of anchor terms; an early-exit scan wins).
  * NULL inputs or no posted term present → false (the HOF form yields
  * NULL there; the enclosing filter drops the row identically).
  */
case class FirstPresentEquals(posted: Expression, hits: Expression, pterm: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(posted, hits, pterm)
  override def nullable: Boolean = false
  override def dataType: DataType = BooleanType
  override def prettyName: String = "first_present_equals"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(posted, hits).forall(_.dataType match {
      case ArrayType(StringType, _) => true
      case _                        => false
    }) && pterm.dataType == StringType
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs (array<string>, array<string>, string), got ${children.map(_.dataType.catalogString)}")
  }

  override def eval(input: InternalRow): Any = {
    val p = posted.eval(input)
    val h = hits.eval(input)
    val t = pterm.eval(input)
    if (p == null || h == null || t == null) return false
    val ps = p.asInstanceOf[ArrayData]
    val hs = h.asInstanceOf[ArrayData]
    val term = t.asInstanceOf[UTF8String]
    val np = ps.numElements()
    val nh = hs.numElements()
    var i = 0
    while (i < np) {
      if (!ps.isNullAt(i)) {
        val cand = ps.getUTF8String(i)
        var j = 0
        while (j < nh) {
          if (!hs.isNullAt(j) && hs.getUTF8String(j).equals(cand)) return cand.equals(term)
          j += 1
        }
      }
      i += 1
    }
    false
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(posted = newChildren(0), hits = newChildren(1), pterm = newChildren(2))
}

/** Flat-tier verification: every clean term of `terms` present in
  * `toks` — the compiled form of
  * `forall(cleanTerms(terms), t => array_contains(toks, t))`. NULL terms
  * or toks → false (the enclosing filter drops the row either way).
  */
case class AllCleanTermsIn(terms: Expression, toks: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(terms, toks)
  override def nullable: Boolean = false
  override def dataType: DataType = BooleanType
  override def prettyName: String = "all_clean_terms_in"

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType match {
      case ArrayType(StringType, _) => true
      case _                        => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs two array<string> inputs, got ${children.map(_.dataType.catalogString)}")

  override def eval(input: InternalRow): Any = {
    val t = terms.eval(input)
    val x = toks.eval(input)
    if (t == null || x == null) return false
    val ts = t.asInstanceOf[ArrayData]
    val xs = x.asInstanceOf[ArrayData]
    val n = ts.numElements()
    var i = 0
    while (i < n) {
      if (!ts.isNullAt(i)) {
        val term = ts.getUTF8String(i)
        if (term.numBytes() > 0) {
          val m = xs.numElements()
          var found = false
          var j = 0
          while (!found && j < m) {
            found = !xs.isNullAt(j) && xs.getUTF8String(j).equals(term)
            j += 1
          }
          if (!found) return false
        }
      }
      i += 1
    }
    true
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(terms = newChildren(0), toks = newChildren(1))
}
