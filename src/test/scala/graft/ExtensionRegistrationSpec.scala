package graft

import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions: custom expressions reachable from the SQL text
  * surface.
  */
class ExtensionRegistrationSpec extends AnyFunSuite {

  test("word_shingles is callable from SQL after registration") {
    val s = SparkTestBase.spark
    GraftExtensions.register(s)
    val rows = s.sql("SELECT word_shingles('a b c d', 2) AS sh")
      .collect().head.getSeq[String](0)
    assert(rows == Seq("a b", "b c", "c d"))
    val n3 = s.sql("SELECT word_shingles('x y', 3) AS sh")
      .collect().head.getSeq[String](0)
    assert(n3.isEmpty)
  }

  test("word_grams keeps duplicates where word_shingles dedups, from SQL") {
    val s = SparkTestBase.spark
    GraftExtensions.register(s)
    assert(s.sql("SELECT word_grams('a b a b', 2) AS g")
      .collect().head.getSeq[String](0) == Seq("a b", "b a", "a b"))
    assert(s.sql("SELECT word_shingles('a b a b', 2) AS g")
      .collect().head.getSeq[String](0) == Seq("a b", "b a"))
  }
}
