package graft.plans

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.plans.LeftSemi
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Index-aware query planning (SURVEY §4: "a custom Rule … justified
  * only if we later add index-aware planning — rewrite full-text
  * predicates to postings joins automatically"). This is that rule.
  *
  * `graft_contains_term(content, 'word')` is a total predicate: its
  * fallback evaluation runs the faithful analysis pipeline over the
  * content column (correct anywhere, O(doc) per row). When the scanned
  * view has a registered inverted index ([[IndexCatalog.register]]),
  * [[TermRewriteRule]] replaces the predicate with a LEFT SEMI join
  * against the (tiny, term-filtered) postings docno set — the scan
  * never tokenizes, and the join side is a few rows selected by the
  * index.
  *
  * Contract: the registered view's plan must expose a `docno` column
  * (the schema `InvertedIndex.build` produces).
  */

/** Boolean predicate: does `content` contain `term` after the faithful
  * tokenize→stopword→stem analysis? */
case class GraftContainsTerm(left: Expression, right: Expression)
    extends BinaryExpression with Predicate with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_contains_term expects (string, string)")

  override def prettyName: String = "graft_contains_term"

  @transient private lazy val analyzedQuery: Seq[String] =
    right match {
      case Literal(v: UTF8String, StringType) =>
        graft.text.TextPipeline.processContent(v.toString)
      case _ => null
    }

  override def nullSafeEval(content: Any, term: Any): Any = {
    val q =
      if (analyzedQuery != null) analyzedQuery
      else graft.text.TextPipeline.processContent(term.toString)
    val docTerms = graft.text.TextPipeline
      .processContent(content.asInstanceOf[UTF8String].toString).toSet
    q.nonEmpty && q.forall(docTerms.contains)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GraftContainsTerm =
    copy(left = newLeft, right = newRight)
}

/** Wildcard-pattern predicate: does `content` contain a RAW token
  * (faithful tag-aware tokenization) that survives the stopword filter
  * and matches `pattern` — literal segments joined by any number of
  * `*`s (e.g. `st*am`, `a*b*c`)? The fallback evaluation tokenizes the
  * row (correct anywhere, O(doc) per row); with a registered char-gram
  * index, [[TermRewriteRule]] prepends an index-driven LEFT SEMI
  * candidate join and keeps this predicate as the exact RECHECK —
  * the classic lossy-index + recheck shape (the stemmed postings can
  * over-approximate raw-token membership, never under-approximate it,
  * so the semi join is a sound prefilter and the recheck restores
  * exactness while running on candidates only).
  *
  * `recheck=true` marks an instance the rule already processed, making
  * the rewrite idempotent (the retained copy must not re-fire). */
case class GraftMatchesTermLike(left: Expression, right: Expression,
                                recheck: Boolean = false)
    extends BinaryExpression with Predicate with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_matches_term_like expects (string, string)")

  override def prettyName: String = "graft_matches_term_like"

  private def compile(p: String): java.util.regex.Pattern =
    java.util.regex.Pattern.compile(graft.query.QueryEngine
      .wildcardRegex(p.toLowerCase(java.util.Locale.ROOT)))

  @transient private lazy val compiledPattern: java.util.regex.Pattern =
    right match {
      case Literal(v: UTF8String, StringType) => compile(v.toString)
      case _ => null
    }

  // last-value cache for NON-literal patterns (e.g. a column-valued
  // pattern): without it every row of an O(corpus) scan would re-split
  // + re-quote + Pattern.compile. Single (src, compiled) cell so a
  // racy double-compute can never pair a pattern with the wrong regex.
  @transient private var cached: (String, java.util.regex.Pattern) = _

  override def nullSafeEval(content: Any, pattern: Any): Any = {
    val rx =
      if (compiledPattern != null) compiledPattern
      else {
        val p = pattern.toString
        val c = cached
        if (c != null && c._1 == p) c._2
        else { val rc = compile(p); cached = (p, rc); rc }
      }
    graft.text.TextPipeline
      .tokenizeOnly(content.asInstanceOf[UTF8String].toString)
      .exists(t => rx.matcher(t).matches() &&
        !graft.text.TextPipeline.stopwords.contains(t))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GraftMatchesTermLike =
    copy(left = newLeft, right = newRight)
}

/** View-name → (postings DataFrame, indexed content column) registry
  * consulted by the rule. The column name records WHICH view column the
  * index was built over — the rule only rewrites predicates whose left
  * side is a bare reference to that column; any other shape
  * (`graft_contains_term(docid, …)`, `…(upper(content), …)`) keeps the
  * fallback's semantics. */
object IndexCatalog {
  /** `chargrams` (the [[graft.index.CharKGramIndex]] table built over
    * the SAME corpus/column) additionally enables the wildcard-pattern
    * rewrite ([[GraftMatchesTermLike]]). */
  final case class Entry(postings: DataFrame, contentCol: String,
                         chargrams: Option[DataFrame] = None)

  private val indexes = TrieMap.empty[String, Entry]

  def register(viewName: String,
               ix: graft.index.InvertedIndex.Index,
               contentCol: String = "content",
               chargrams: Option[DataFrame] = None): Unit =
    indexes.put(viewName.toLowerCase(java.util.Locale.ROOT),
      Entry(ix.postings, contentCol, chargrams))

  def get(viewName: String): Option[Entry] =
    indexes.get(viewName.toLowerCase(java.util.Locale.ROOT))

  def clear(): Unit = indexes.clear()
}

/** Plan-surgery helpers shared by the rewrite rule and the
  * custom-operator builders. */
object PlanUtils {
  /** Deep-copy a plan with every exprId renewed, so joining it against
    * a plan sharing ancestry cannot produce conflicting attribute
    * references. */
  def freshCopy(plan: LogicalPlan): LogicalPlan = {
    val idMap = scala.collection.mutable.Map.empty[ExprId, ExprId]
    def freshId(id: ExprId): ExprId =
      idMap.getOrElseUpdate(id, NamedExpression.newExprId)
    plan.transformUp { case node =>
      node.transformExpressions {
        case a: AttributeReference => a.withExprId(freshId(a.exprId))
        case al: Alias =>
          Alias(al.child, al.name)(freshId(al.exprId), al.qualifier,
            al.explicitMetadata, al.nonInheritableMetadataKeys)
      }
    }
  }
}

/** Rewrites `Filter(... graft_contains_term(content, 'w') ...)` over a
  * registered view into a left-semi join with the postings docnos of
  * the analyzed term(s).
  *
  * Injected as a POST-HOC RESOLUTION rule (not an optimizer rule): it
  * must see the plan while the view's `SubqueryAlias` still names the
  * relation and before predicate pushdown moves the term predicate
  * into the scan. */
case class TermRewriteRule() extends Rule[LogicalPlan] {

  private def aliasOf(plan: LogicalPlan): Option[String] = plan match {
    case SubqueryAlias(id, _) => Some(id.name)
    case u: UnaryNode => aliasOf(u.child)
    case _ => None
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** The view and the postings both derive from the same index
    * DataFrames — see [[PlanUtils.freshCopy]]. */
  private def freshCopy(plan: LogicalPlan): LogicalPlan =
    PlanUtils.freshCopy(plan)

  /** Is `left` a bare reference to the column the index was built
    * over? Anything else — a different column, or any computed
    * expression (`upper(content)`) — must keep the fallback's
    * evaluate-the-pipeline semantics, because the postings only
    * describe the raw indexed column. */
  private def isIndexedColumn(left: Expression, contentCol: String): Boolean =
    left match {
      case a: AttributeReference =>
        a.name.equalsIgnoreCase(contentCol)
      case _ => false
    }

  /** An OR-tree whose leaves are all single-analyzed-term predicates
    * over the indexed column: returns the union of their analyzed terms
    * (stopword-only leaves contribute nothing — they are `false` in the
    * fallback). None when any leaf is not a rewritable term predicate. */
  private def orTermsOf(e: Expression, contentCol: String): Option[Seq[String]] = e match {
    case Or(l, r) =>
      for { a <- orTermsOf(l, contentCol); b <- orTermsOf(r, contentCol) } yield a ++ b
    case GraftContainsTerm(left, Literal(v: UTF8String, StringType))
        if isIndexedColumn(left, contentCol) =>
      val analyzed = graft.text.TextPipeline.processContent(v.toString)
      if (analyzed.size <= 1) Some(analyzed) else None
    case _ => None
  }

  /** Is `e` a wildcard-pattern predicate the rule can accelerate?
    * Requires a registered char-gram table, a bare indexed-column
    * reference, a literal pattern containing at least one `*`, and no
    * recheck marker (already-processed copies must not re-fire). */
  private def isRewritableLike(e: Expression, entry: IndexCatalog.Entry): Boolean =
    e match {
      case g @ GraftMatchesTermLike(left, Literal(v: UTF8String, StringType), false) =>
        isIndexedColumn(left, entry.contentCol) &&
          entry.chargrams.isDefined && v.toString.contains("*")
      case _ => false
    }

  /** Candidate docnos for a wildcard pattern, as a lazy logical plan:
    * char-gram expansion of the pattern ([[graft.query.QueryEngine
    * .wildcardTerms]]: gram intersection + regex verify over the
    * vocabulary), re-analyzed to the postings' stemmed term space, then
    * one broadcast probe into the postings — vocabulary-bounded at any
    * corpus size, mirroring `wildcardSearch`'s serving plan. */
  private def wildcardDocnos(entry: IndexCatalog.Entry,
                             pattern: String): LogicalPlan = {
    import org.apache.spark.sql.functions.{broadcast, explode, udf}
    val analyzeTerm = udf((t: String) =>
      graft.text.TextPipeline.processContent(t))
    val expanded = graft.query.QueryEngine
      .wildcardTerms(entry.chargrams.get, pattern)
      .select(explode(analyzeTerm(col("term"))).as("kgram"))
      .distinct()
    freshCopy(entry.postings.join(broadcast(expanded), "kgram")
      .select(col("docno"))
      .queryExecution.analyzed)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transformUp {
    case f @ Filter(cond, child) if aliasOf(child).exists(n =>
        IndexCatalog.get(n).isDefined) &&
        cond.exists(e => e.isInstanceOf[GraftContainsTerm] ||
          e.isInstanceOf[GraftMatchesTermLike]) =>
      val entry = IndexCatalog.get(aliasOf(child).get).get
      val postings = entry.postings
      val contentCol = entry.contentCol
      val docnoAttr = child.output.find(_.name == "docno")
      val conjuncts = splitConjuncts(cond)
      val (termPreds, nonTerm) = conjuncts.partition {
        case GraftContainsTerm(left, Literal(_, StringType)) =>
          isIndexedColumn(left, contentCol)
        case e => orTermsOf(e, contentCol).isDefined
      }
      val (likePreds, rest) = nonTerm.partition(isRewritableLike(_, entry))
      if (docnoAttr.isEmpty || (termPreds.isEmpty && likePreds.isEmpty)) f
      else {
        def semiJoin(acc: LogicalPlan, right: LogicalPlan): LogicalPlan =
          Join(acc, right, LeftSemi,
            Some(EqualTo(docnoAttr.get, right.output.head)), JoinHint.NONE)
        def termDocnos(terms: Seq[String]): LogicalPlan =
          freshCopy(postings
            .filter(col("kgram").isin(terms: _*)).select(col("docno"))
            .queryExecution.analyzed)
        val joined = termPreds.foldLeft(child) { (acc, pred) =>
          pred match {
            case GraftContainsTerm(left, Literal(v: UTF8String, StringType))
                if isIndexedColumn(left, contentCol) =>
              val analyzed =
                graft.text.TextPipeline.processContent(v.toString)
              // empty analysis (stopword-only term) matches nothing —
              // the fallback's `q.nonEmpty` guard
              if (analyzed.isEmpty) Filter(Literal.FalseLiteral, acc)
              // one semi join per analyzed term = conjunctive
              // containment, matching the fallback's `forall`
              else analyzed.foldLeft(acc)((a, t) =>
                semiJoin(a, termDocnos(Seq(t))))
            case orTree =>
              // disjunction: ONE semi join on the union of the terms'
              // postings (the reference's disjunctive query semantics)
              val terms = orTermsOf(orTree, contentCol).get
              if (terms.isEmpty) Filter(Literal.FalseLiteral, acc)
              else semiJoin(acc, termDocnos(terms.distinct))
          }
        }
        // wildcard predicates: index-driven candidate semi join, then
        // KEEP the predicate (marked) as the exact recheck — stemming
        // can merge distinct raw surface forms into one postings term,
        // so the candidate set is a superset and the recheck restores
        // raw-token exactness on candidates only
        val wildJoined = likePreds.foldLeft(joined) { (acc, pred) =>
          pred match {
            case GraftMatchesTermLike(_, Literal(v: UTF8String, StringType), _) =>
              semiJoin(acc, wildcardDocnos(entry, v.toString))
            case _ => acc // unreachable: isRewritableLike pinned the shape
          }
        }
        val kept = rest ++ likePreds.map {
          case g: GraftMatchesTermLike => g.copy(recheck = true)
          case other => other
        }
        kept.reduceOption(And).map(Filter(_, wildJoined)).getOrElse(wildJoined)
      }
  }
}
