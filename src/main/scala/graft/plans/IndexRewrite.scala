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

/** View-name → postings DataFrame registry consulted by the rule. */
object IndexCatalog {
  private val indexes = TrieMap.empty[String, DataFrame]

  def register(viewName: String,
               ix: graft.index.InvertedIndex.Index): Unit =
    indexes.put(viewName.toLowerCase, ix.postings)

  def get(viewName: String): Option[DataFrame] =
    indexes.get(viewName.toLowerCase)

  def clear(): Unit = indexes.clear()
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

  /** Deep-copy a plan with every exprId renewed, so joining it against
    * a plan sharing ancestry (the view and the postings both derive
    * from the same index DataFrames) cannot produce conflicting
    * attribute references. Returns the plan and its renewed output. */
  private def freshCopy(plan: LogicalPlan): LogicalPlan = {
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

  /** An OR-tree whose leaves are all single-analyzed-term predicates:
    * returns the union of their analyzed terms (stopword-only leaves
    * contribute nothing — they are `false` in the fallback). None when
    * any leaf is not a rewritable term predicate. */
  private def orTermsOf(e: Expression): Option[Seq[String]] = e match {
    case Or(l, r) =>
      for { a <- orTermsOf(l); b <- orTermsOf(r) } yield a ++ b
    case GraftContainsTerm(_, Literal(v: UTF8String, StringType)) =>
      val analyzed = graft.text.TextPipeline.processContent(v.toString)
      if (analyzed.size <= 1) Some(analyzed) else None
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transformUp {
    case f @ Filter(cond, child) if aliasOf(child).exists(n =>
        IndexCatalog.get(n).isDefined) &&
        cond.exists(_.isInstanceOf[GraftContainsTerm]) =>
      val postings = IndexCatalog.get(aliasOf(child).get).get
      val docnoAttr = child.output.find(_.name == "docno")
      val (termPreds, rest) = splitConjuncts(cond).partition {
        case GraftContainsTerm(_, Literal(_, StringType)) => true
        case e => orTermsOf(e).isDefined
      }
      if (docnoAttr.isEmpty || termPreds.isEmpty) f
      else {
        def semiJoin(acc: LogicalPlan, terms: Seq[String]): LogicalPlan = {
          val docnos = freshCopy(postings
            .filter(col("kgram").isin(terms: _*)).select(col("docno"))
            .queryExecution.analyzed)
          val rightAttr = docnos.output.head
          Join(acc, docnos, LeftSemi,
            Some(EqualTo(docnoAttr.get, rightAttr)), JoinHint.NONE)
        }
        val joined = termPreds.foldLeft(child) { (acc, pred) =>
          pred match {
            case GraftContainsTerm(_, Literal(v: UTF8String, StringType)) =>
              val analyzed =
                graft.text.TextPipeline.processContent(v.toString)
              // empty analysis (stopword-only term) matches nothing —
              // the fallback's `q.nonEmpty` guard
              if (analyzed.isEmpty) Filter(Literal.FalseLiteral, acc)
              // one semi join per analyzed term = conjunctive
              // containment, matching the fallback's `forall`
              else analyzed.foldLeft(acc)((a, t) => semiJoin(a, Seq(t)))
            case orTree =>
              // disjunction: ONE semi join on the union of the terms'
              // postings (the reference's disjunctive query semantics)
              val terms = orTermsOf(orTree).get
              if (terms.isEmpty) Filter(Literal.FalseLiteral, acc)
              else semiJoin(acc, terms.distinct)
          }
        }
        rest.reduceOption(And).map(Filter(_, joined)).getOrElse(joined)
      }
  }
}
