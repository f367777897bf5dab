package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions surface: a session created with
  * GraftExtensions resolves the injected SQL functions with no Scala-API
  * involvement. Builds a sibling session over the shared SparkContext
  * (extensions apply only at session construction). */
class ExtensionsSpec extends AnyFunSuite {

  test("injected SQL functions resolve and compute") {
    TestSpark.spark // ensure the shared context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = try SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    finally () // default/active restored below
    try {
      val row = s.sql(
        """SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
          |       rolling_hash('abc') AS rh,
          |       size(word_shingles(array('a','b','c','d'), 2)) AS ns
          |""".stripMargin).collect().head
      assert(row.getDouble(0) == 11.0)
      val expRh = "abc".foldLeft(0L)((h, c) => (h * 31 + c) % 2147483647L)
      assert(row.getLong(1) == expRh)
      assert(row.getInt(2) == 3)
    } finally {
      SparkSession.setDefaultSession(TestSpark.spark)
      SparkSession.setActiveSession(TestSpark.spark)
    }
  }
}
