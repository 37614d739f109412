package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic hashing and tokenization primitives.
  *
  * Everything here is built from sequential left-folds (`aggregate` in
  * Spark, `list_reduce` in DuckDB) over identical element sequences in
  * identical integer/double arithmetic, so Spark results are
  * **bit-identical** to the DuckDB oracle — no approximate compare
  * needed. That is what lets MinHash / SimHash / cosine queries be
  * oracle-checked rather than rows-only.
  *
  * Scale posture: all of these are narrow per-row expressions (no
  * shuffle, no UDF — pure Catalyst expression trees, codegen'd), so they
  * vectorize inside WholeStageCodegen and scale linearly with input.
  */
object CrossHash {

  /** Modulus for word/shingle hashes: large 30-bit prime. */
  val P: Long = 1073741789L

  /** Modulus for minhash permutations (bigger prime, < 2^30 so
    * a*h+b stays well inside Long). */
  val PM: Long = 1000000007L

  /** Polynomial rolling hash: fold (acc*31 + codepoint) % p over the
    * characters of `s`. Matches [[ddbPolyHash]] bit-for-bit. */
  def polyHash(s: Column, p: Long = P): Column =
    aggregate(split(s, ""), lit(0L),
      (acc, ch) => (acc * 31 + ascii(ch)) % p)

  /** DuckDB SQL fragment computing exactly [[polyHash]] of `expr`. */
  def ddbPolyHash(expr: String, p: Long = P): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split($expr, ''), c -> CAST(unicode(c) AS BIGINT))), " +
      s"(acc, c) -> (acc * 31 + c) % $p)"

  /** Relational tokenizer (SURVEY §2.2 SQL-subset): lower, collapse
    * non-alphanumerics to spaces, split, drop empties. Returns
    * ARRAY<STRING>. */
  def tokensArray(text: Column): Column =
    filter(split(regexp_replace(lower(text), "[^a-z0-9]+", " "), " "),
      t => t =!= "")

  /** [[tokensArray]] as one JVM scan (alnum-run splitting == the regex
    * collapse+split+filter chain): identical output, ~10× cheaper than
    * the regex/array expression pipeline on hot paths. */
  val tokensArrayFast: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((text: String) => {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      val sb = new StringBuilder
      val lower = text.toLowerCase(java.util.Locale.ROOT)
      var i = 0
      while (i <= lower.length) {
        val c = if (i < lower.length) lower.charAt(i) else ' '
        if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) sb.append(c)
        else if (sb.nonEmpty) { out += sb.toString; sb.clear() }
        i += 1
      }
      out.toSeq
    })

  /** DuckDB fragment for [[tokensArray]]. */
  def ddbTokensArray(expr: String): String =
    s"list_filter(string_split(regexp_replace(lower($expr), '[^a-z0-9]+', ' ', 'g'), ' '), t -> t <> '')"

  /** Word k-shingles (k consecutive tokens joined by one space) of a
    * token array; < k tokens → empty array. */
  def shingles(toks: Column, k: Int = 3): Column =
    when(size(toks) >= k,
      transform(sequence(lit(1), size(toks) - (k - 1)),
        i => concat_ws(" ", (0 until k).map(j => element_at(toks, i + j)): _*)))
      .otherwise(array().cast("array<string>"))

  /** DuckDB fragment for [[shingles]] (k=3) over a token-list expr.
    * `range(1, len-1)` is empty when len < 3, covering the guard. */
  def ddbShingles3(toks: String): String =
    s"list_transform(range(1, len($toks) - 1), " +
      s"i -> $toks[i] || ' ' || $toks[i+1] || ' ' || $toks[i+2])"

  /** MinHash permutations: (i, a, b) for mh_i(h) = (a*h + b) % PM.
    * Constants are fixed so the DuckDB oracle can embed them. */
  val MinhashPerms: Seq[(Int, Long, Long)] = Seq(
    (0, 854552865L, 398494553L),
    (1, 96560957L, 467070119L),
    (2, 772396659L, 684928199L),
    (3, 70564509L, 94586944L),
    (4, 156476161L, 869612186L),
    (5, 927524103L, 952683199L),
    (6, 178293259L, 125362900L),
    (7, 573472005L, 599391201L),
    (8, 609809905L, 611993198L),
    (9, 45457269L, 91883033L),
    (10, 181652465L, 331042935L),
    (11, 312801113L, 438046106L),
    (12, 20293437L, 444445406L),
    (13, 313632443L, 994981021L),
    (14, 758301915L, 277315172L),
    (15, 899211397L, 155953859L))

  /** Number of LSH bands over the 16-component signature (4 rows/band). */
  val Bands = 4
  val RowsPerBand: Int = MinhashPerms.size / Bands

  /** DuckDB VALUES table literal for [[MinhashPerms]]. */
  def ddbPermValues: String =
    MinhashPerms.map { case (i, a, b) => s"($i, $a, $b)" }
      .mkString("(VALUES ", ", ", ") perm(i, a, b)")
}
