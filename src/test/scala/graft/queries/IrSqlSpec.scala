package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

class IrSqlSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("wildcard with only short segments falls back to LIKE over the " +
    "whole vocabulary instead of an empty gram intersection") {
    // both anchored segments of s*m are shorter than k=3 → no grams
    val got = IrSql.q09Wildcard(spark, dir, pattern = "s*m")
      .collect().map(_.getString(0)).toSeq
    val expected = IrSql.q08CharGrams(spark, dir)
      .select("term").distinct()
      .filter(col("term").like("s%m"))
      .orderBy("term")
      .collect().map(_.getString(0)).toSeq
    assert(expected.nonEmpty, "test vocabulary should contain s…m terms")
    assert(got == expected)
  }

  test("gram-filtered wildcard path still agrees with a plain LIKE scan") {
    val got = IrSql.q09Wildcard(spark, dir, pattern = "st*am")
      .collect().map(_.getString(0)).toSeq
    val expected = IrSql.q08CharGrams(spark, dir)
      .select("term").distinct()
      .filter(col("term").like("st%am"))
      .orderBy("term")
      .collect().map(_.getString(0)).toSeq
    assert(got == expected && got.nonEmpty)
  }
}
