package graft.search

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native analyzer-chain kernels (r18).
  *
  * [[SearchDsl.analyzeWith]] / [[SearchDsl.matchPhraseWith]] built the
  * token-filter chain from higher-order array expressions
  * (transform/filter/flatten with when-chains and regexp_replace inside
  * the lambdas). Spark evaluates HOF lambdas interpreted — no
  * whole-stage codegen — so every doc row paid several interpreted
  * passes over its token array (search_match_phrase_stemmed spent
  * ~0.9 s of its 1.2 s there at sf0.1). These expressions evaluate the
  * identical chain in one compiled pass over UTF8String tokens.
  *
  * Bit-equivalence contract (AnalyzeChainSpec pins each against the
  * retired HOF form on fuzzed corpora; AnalyzerSpec's SQL↔JVM lockstep
  * and the DuckDB oracle gate re-check end to end):
  *   - tokenize+lowercase = `split(lower(text), " ")`: the SAME
  *     UTF8String.toLowerCase / UTF8String.split(" ", -1) calls the
  *     Lower / StringSplit expressions make — locale-free lowercase,
  *     regex-split semantics with trailing empties kept.
  *   - Stop(words): drop tokens equal (UTF8String equality, the
  *     isInCollection compare) to any stopword, at the stage's declared
  *     position in the chain.
  *   - SStem: Harman's three rules exactly as [[SearchDsl.sStem]] spells
  *     them — length() is numChars, endsWith is the byte compare the
  *     EndsWith expression does, and the rewrites drop the (ASCII)
  *     suffix by code point, which is what regexp_replace("ies$"/"es$"/
  *     "s$") does on a token the when-guard admitted.
  *   - EdgeNgram(mn, mx): for n in mn..min(mx, numChars): substringSQL
  *     (1, n) — the Substring expression's own kernel.
  */
object AnalyzeChain {

  private[search] def tokenize(text: UTF8String): Array[UTF8String] =
    text.toLowerCase.split(UTF8String.fromString(" "), -1)

  private[search] def sStem(t: UTF8String): UTF8String = {
    val len = t.numChars()
    def ends(s: String) = t.endsWith(UTF8String.fromString(s))
    if (len > 3 && ends("ies") && !ends("eies") && !ends("aies"))
      UTF8String.concat(t.substring(0, len - 3), UTF8String.fromString("y"))
    else if (len > 3 && ends("es") && !ends("aes") && !ends("ees") && !ends("oes"))
      t.substring(0, len - 1)
    else if (len > 2 && ends("s") && !ends("us") && !ends("ss"))
      t.substring(0, len - 1)
    else t
  }

  /** The full chain over a text value: lowercase+split, then each
    * declared stage in order. Mirrors [[SearchDsl.analyzeWith]].
    */
  private[search] def run(text: UTF8String, filters: Seq[TokenFilter]): Array[UTF8String] = {
    var toks: Array[UTF8String] = tokenize(text)
    filters.foreach {
      case TokenFilter.Stop(words) =>
        val set = new java.util.HashSet[UTF8String](words.length * 2)
        words.foreach(w => set.add(UTF8String.fromString(w)))
        toks = toks.filter(t => !set.contains(t))
      case TokenFilter.SStem =>
        toks = toks.map(sStem)
      case TokenFilter.EdgeNgram(mn, mx) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
        toks.foreach { t =>
          val len = t.numChars()
          var n = mn
          val hi = math.min(mx, len)
          while (n <= hi) { out += t.substringSQL(1, n); n += 1 }
        }
        toks = out.toArray
    }
    toks
  }

  /** One token through the chain's scalar form (null = stopped) —
    * mirrors [[SearchDsl]]'s tokenThrough; edge_ngram has no scalar
    * form and is rejected at construction by [[PhraseChainMatch]].
    */
  private[search] def through(tok: UTF8String, filters: Seq[TokenFilter],
      stopSets: Array[java.util.HashSet[UTF8String]]): UTF8String = {
    var cur = tok
    var si = 0
    var i = 0
    while (i < filters.length && cur != null) {
      filters(i) match {
        case TokenFilter.Stop(_) =>
          if (stopSets(si).contains(cur)) cur = null
          si += 1
        case TokenFilter.SStem =>
          cur = sStem(cur)
        case TokenFilter.EdgeNgram(_, _) =>
          throw new IllegalStateException("edge_ngram has no scalar form")
      }
      i += 1
    }
    cur
  }
}

/** `analyzeWith` as one compiled eval: the analyzed token array of a
  * text column under the chain. NULL text → NULL (split(lower(null))).
  */
case class AnalyzeChainExpr(child: Expression, filters: Seq[TokenFilter])
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = child.nullable
  // containsNull = true to match split()'s ArrayType exactly — a
  // nullability flip would ripple into downstream struct/parquet schemas
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "analyze_chain"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string child, got ${child.dataType.catalogString}")

  override def eval(input: InternalRow): Any = {
    val t = child.eval(input)
    if (t == null) null
    else new GenericArrayData(
      AnalyzeChain.run(t.asInstanceOf[UTF8String], filters).asInstanceOf[Array[Any]])
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

/** `matchPhraseWith`'s positional verdict as one compiled eval: do the
  * kept (normalized term, original offset) query tokens occur in the
  * document with EXACTLY their offset gaps, each document token carrying
  * its ORIGINAL position and normalizing through the chain's scalar
  * form (stopwords leave positional gaps — the Lucene
  * enablePositionIncrements behavior the HOF form implemented).
  * NULL text → NULL (the HOF form's null, dropped by the filter).
  */
case class PhraseChainMatch(child: Expression, filters: Seq[TokenFilter], kept: Seq[(String, Int)])
    extends Expression with CodegenFallback {

  require(kept.nonEmpty, "all-stopword phrases compile to lit(false) before this expression")
  require(!filters.exists(_.isInstanceOf[TokenFilter.EdgeNgram]),
    "positional phrase match is undefined under an edge_ngram chain")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = child.nullable
  override def dataType: DataType = BooleanType
  override def prettyName: String = "phrase_chain_match"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string child, got ${child.dataType.catalogString}")

  @transient private lazy val stopSets: Array[java.util.HashSet[UTF8String]] =
    filters.collect { case TokenFilter.Stop(words) =>
      val s = new java.util.HashSet[UTF8String](words.length * 2)
      words.foreach(w => s.add(UTF8String.fromString(w)))
      s
    }.toArray
  @transient private lazy val keptTerms: Array[UTF8String] =
    kept.map(k => UTF8String.fromString(k._1)).toArray
  @transient private lazy val offsets: Array[Int] = kept.map(_._2).toArray

  override def eval(input: InternalRow): Any = {
    val t = child.eval(input)
    if (t == null) return null
    val toks = AnalyzeChain.tokenize(t.asInstanceOf[UTF8String])
    // positions per kept term (tiny arrays; docs are token-bounded)
    val positions = Array.fill(keptTerms.length)(new java.util.ArrayList[Integer]())
    var i = 0
    while (i < toks.length) {
      val nt = AnalyzeChain.through(toks(i), filters, stopSets)
      if (nt != null) {
        var j = 0
        while (j < keptTerms.length) {
          if (keptTerms(j).equals(nt)) positions(j).add(i)
          j += 1
        }
      }
      i += 1
    }
    val p0 = positions(0)
    val o0 = offsets(0)
    var a = 0
    while (a < p0.size()) {
      val x = p0.get(a).intValue()
      var ok = true
      var j = 1
      while (ok && j < keptTerms.length) {
        ok = positions(j).contains(Integer.valueOf(x + offsets(j) - o0))
        j += 1
      }
      if (ok) return true
      a += 1
    }
    false
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

/** `matchScoreWith`'s hit count as one compiled eval: Σ over query
  * terms of [term present in the analyzed token array] — the sum of
  * array_contains indicators, with the chain run ONCE per row instead
  * of once per term. NULL text → 0 hits? No: the HOF form's
  * array_contains(null, t) yields NULL per term and the SUM of NULL
  * casts is NULL — replicated here (NULL text → NULL score).
  */
case class ChainTermHits(child: Expression, filters: Seq[TokenFilter], terms: Seq[String])
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = IntegerType
  override def prettyName: String = "chain_term_hits"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string child, got ${child.dataType.catalogString}")

  @transient private lazy val termArr: Array[UTF8String] =
    terms.map(UTF8String.fromString).toArray

  override def eval(input: InternalRow): Any = {
    val t = child.eval(input)
    if (t == null) return null
    val toks = AnalyzeChain.run(t.asInstanceOf[UTF8String], filters)
    var score = 0
    var j = 0
    while (j < termArr.length) {
      val q = termArr(j)
      var found = false
      var i = 0
      while (!found && i < toks.length) { found = toks(i).equals(q); i += 1 }
      if (found) score += 1
      j += 1
    }
    score
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}
