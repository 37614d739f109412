package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the engine's hot scalar functions —
  * codegen'd (they inline into WholeStageCodegen; no UDF serialization,
  * no codegen fence), registered either per-session
  * ([[GraftFunctions.register]]) or via config
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  */

/** Polynomial rolling hash (acc*31 + codepoint) % p over Unicode CODE
  * POINTS (surrogate pairs fold as one step) — identical results to
  * [[graft.ops.CrossHash.polyHash]]'s fold (Spark `split(s,'')` yields
  * whole code points, `ascii()` their value) and the DuckDB oracle's
  * `unicode()`-based list_reduce, for all input including non-BMP. */
case class PolyHashExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_polyhash expects (string, bigint), got " +
        s"(${left.dataType}, ${right.dataType})")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_polyhash"

  override def nullSafeEval(str: Any, p: Any): Any =
    PolyHashExpr.hash(str.asInstanceOf[UTF8String].toString,
      p.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, p) => {
      // fresh locals: two instances of this expression in one
      // whole-stage-codegen scope must not collide in Janino
      val str = ctx.freshName("gfs"); val acc = ctx.freshName("gfacc")
      val i = ctx.freshName("gfi"); val cp = ctx.freshName("gfcp")
      s"""
      java.lang.String $str = $s.toString();
      long $acc = 0L;
      int $i = 0;
      while ($i < $str.length()) {
        int $cp = $str.codePointAt($i);
        $acc = ($acc * 31L + $cp) % $p;
        $i += java.lang.Character.charCount($cp);
      }
      ${ev.value} = $acc;
    """})

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PolyHashExpr =
    copy(left = newLeft, right = newRight)
}

object PolyHashExpr {
  def hash(s: String, p: Long): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31 + cp) % p
      i += Character.charCount(cp)
    }
    acc
  }
}

/** Porter2 stem as a native expression (static call into the pure
  * [[graft.text.PorterStemmer]]; the JIT inlines it inside the codegen
  * pipeline). */
case class StemExpr(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_stem expects string, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_stem"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      graft.text.PorterStemmer.stem(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.text.PorterStemmer.stem($c.toString()));")

  override protected def withNewChildInternal(newChild: Expression): StemExpr =
    copy(child = newChild)
}

/** |A ∩ B| of two parallel-sorted (hash, string) array pairs by linear
  * merge: compare 64-bit hashes first (primitive `getLong`, no
  * allocation), fall back to a UTF8String compare ONLY when hashes tie
  * — so the result is unconditionally exact (a hash collision costs
  * one string compare, never a wrong count) while the hot loop is
  * ~|A|+|B| long compares.
  *
  * Contract: both (hash, string) pairs sorted lexicographically by
  * (hash asc, string asc), duplicate-free (set semantics) — the shape
  * [[graft.ops.Dedup.docShingleSets]] emits.
  *
  * Exists because the jaccard-dedup threshold predicate collapses
  * into a join condition (PushPredicateThroughJoin) and is evaluated
  * per probed candidate pair, possibly twice (numerator +
  * denominator); `size(array_intersect(...))` there cost tens of
  * seconds at sf0.1 (per-element UTF8String materialization, hash-set
  * build per evaluation) — this merge is ~1µs per pair, cheap enough
  * that plan shape no longer matters. */
case class HashedIntersectSizeExpr(first: Expression, second: Expression,
                                   third: Expression, fourth: Expression)
    extends QuaternaryExpression {
  import org.apache.spark.sql.types.{ArrayType, IntegerType}
  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (ArrayType(LongType, _), ArrayType(StringType, _),
            ArrayType(LongType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_intersect_size expects (array<bigint>, array<string>, " +
          s"array<bigint>, array<string>), got $other")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_intersect_size"

  override def nullSafeEval(ha: Any, sa: Any, hb: Any, sb: Any): Any = {
    import org.apache.spark.sql.catalyst.util.ArrayData
    val xh = ha.asInstanceOf[ArrayData]; val xs = sa.asInstanceOf[ArrayData]
    val yh = hb.asInstanceOf[ArrayData]; val ys = sb.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var c = 0
    val n = xh.numElements(); val m = yh.numElements()
    while (i < n && j < m) {
      val l = xh.getLong(i); val r = yh.getLong(j)
      if (l < r) i += 1
      else if (l > r) j += 1
      else {
        val cmp = xs.getUTF8String(i).compareTo(ys.getUTF8String(j))
        if (cmp == 0) { c += 1; i += 1; j += 1 }
        else if (cmp < 0) i += 1
        else j += 1
      }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (ha, sa, hb, sb) => {
      val i = ctx.freshName("gii"); val j = ctx.freshName("gij")
      val c = ctx.freshName("gic"); val n = ctx.freshName("gin")
      val m = ctx.freshName("gim"); val l = ctx.freshName("gil")
      val r = ctx.freshName("gir"); val cmp = ctx.freshName("gicmp")
      s"""
      int $i = 0, $j = 0, $c = 0;
      int $n = $ha.numElements(), $m = $hb.numElements();
      while ($i < $n && $j < $m) {
        long $l = $ha.getLong($i), $r = $hb.getLong($j);
        if ($l < $r) $i++;
        else if ($l > $r) $j++;
        else {
          int $cmp = $sa.getUTF8String($i).compareTo($sb.getUTF8String($j));
          if ($cmp == 0) { $c++; $i++; $j++; }
          else if ($cmp < 0) $i++;
          else $j++;
        }
      }
      ${ev.value} = $c;
    """})

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): HashedIntersectSizeExpr =
    copy(first = newFirst, second = newSecond,
      third = newThird, fourth = newFourth)
}

/** Cosine similarity of two ARRAY<FLOAT> embeddings in one pass —
  * numerically identical to the declarative
  * `aggregate(zip_with(...))` form it replaces
  * (`Σ (double)a_i*(double)b_i` accumulated left-to-right for each of
  * the three dots, then `ab / (sqrt(aa) * sqrt(bb))`), and identical
  * to the DuckDB oracle's `list_reduce` folds. Exists because Spark
  * evaluates higher-order functions interpreted (outside
  * WholeStageCodegen) — three HOF folds per row made first-run cosine
  * queries ~6× slower than this loop. Null elements are not expected
  * (embedding arrays are dense); a null array yields null, and so does
  * a LENGTH MISMATCH — the declarative `zip_with` pads the shorter
  * array with nulls and the fold returns null, so a malformed
  * mixed-dimension pair must surface as a loud, filterable null here
  * too, never as a plausible-looking cosine over a truncated prefix. */
case class CosineExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_cosine expects (array<float>, array<float>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    import org.apache.spark.sql.catalyst.util.ArrayData
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var ab = 0.0; var aa = 0.0; var bb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble; val yi = y.getFloat(i).toDouble
      ab += xi * yi; aa += xi * xi; bb += yi * yi
      i += 1
    }
    ab / (math.sqrt(aa) * math.sqrt(bb))
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("gcn"); val ab = ctx.freshName("gcab")
      val aa = ctx.freshName("gcaa"); val bb = ctx.freshName("gcbb")
      val i = ctx.freshName("gci"); val x = ctx.freshName("gcx")
      val y = ctx.freshName("gcy")
      s"""
      int $n = $a.numElements();
      if ($b.numElements() != $n) {
        ${ev.isNull} = true;
      } else {
        double $ab = 0.0, $aa = 0.0, $bb = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $x = (double) $a.getFloat($i);
          double $y = (double) $b.getFloat($i);
          $ab += $x * $y; $aa += $x * $x; $bb += $y * $y;
        }
        ${ev.value} = $ab / (java.lang.Math.sqrt($aa) * java.lang.Math.sqrt($bb));
      }
    """})

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineExpr =
    copy(left = newLeft, right = newRight)
}

object GraftFunctions {

  /** THE function table — (name, arity, builder), defined once so the
    * runtime `register` path and the `GraftExtensions` injection path
    * can never drift (a function present in one and not the other
    * would pass every register()-based test and fail only in
    * `spark.sql.extensions`-configured deployments). */
  private[functions] val fns: Seq[(String, Int, Seq[Expression] => Expression)] = Seq(
    ("graft_polyhash", 2, args => PolyHashExpr(args(0), args(1))),
    ("graft_stem_native", 1, args => StemExpr(args(0))),
    ("graft_intersect_size", 4,
      args => HashedIntersectSizeExpr(args(0), args(1), args(2), args(3))),
    ("graft_cosine", 2, args => CosineExpr(args(0), args(1))),
    ("graft_topk", 3, args => TopKByAgg(args(0), args(1), args(2))),
    ("graft_contains_term", 2,
      args => graft.plans.GraftContainsTerm(args(0), args(1))),
    ("graft_matches_term_like", 2,
      args => graft.plans.GraftMatchesTermLike(args(0), args(1))))

  /** Arity guard: a wrong-arity SQL call should fail with the function
    * name and expected signature, not an IndexOutOfBoundsException
    * from a positional args(i). */
  private[functions] def checked(name: String, arity: Int,
      b: Seq[Expression] => Expression): Seq[Expression] => Expression =
    args => {
      if (args.size != arity) throw new IllegalArgumentException(
        s"$name expects $arity argument(s), got ${args.size}")
      b(args)
    }

  /** Idempotent per-session registration (runtime path). */
  def register(spark: SparkSession): Unit =
    fns.foreach { case (name, arity, b) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name), checked(name, arity, b))
    }

  /** Column API over the registered functions. */
  def polyhash(c: Column, p: Long): Column =
    call_function("graft_polyhash", c, lit(p))
  def stemNative(c: Column): Column = call_function("graft_stem_native", c)
  def intersectSize(ha: Column, sa: Column, hb: Column, sb: Column): Column =
    call_function("graft_intersect_size", ha, sa, hb, sb)
  def cosine(a: Column, b: Column): Column =
    call_function("graft_cosine", a, b)
  def topkBy(score: Column, id: Column, k: Int): Column =
    call_function("graft_topk", score, id, lit(k))
}

/** `spark.sql.extensions` entry point: injects the native functions at
  * session build (SURVEY §7.2's SparkSessionExtensions hook). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // the ONE function table (GraftFunctions.fns) — not a copy
    GraftFunctions.fns.foreach { case (name, arity, b) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        GraftFunctions.checked(name, arity, b)))
    }
    // index-aware rewrite: full-text predicate → postings semi-join.
    // post-hoc resolution stage — the view alias is still present and
    // pushdown hasn't buried the predicate in the scan yet
    ext.injectPostHocResolutionRule(_ => graft.plans.TermRewriteRule())
    // whole-operator extension: sort-merge as-of join physical plan
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
