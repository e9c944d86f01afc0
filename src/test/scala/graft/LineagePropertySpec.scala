package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.{LineageExtractor, Names}

/** Generated-DDL properties: for randomly composed CREATE VIEW statements
  * the extractor must return exactly the planted table set (normalized,
  * CTE-excluded, table functions dropped, sorted). */
class LineagePropertySpec extends AnyFunSuite {

  private val keywords = Set(
    "where", "group", "order", "limit", "having", "settings", "union",
    "join", "on", "using", "prewhere", "sample", "array", "left", "right",
    "inner", "full", "cross", "outer", "semi", "anti", "asof", "any", "all",
    "global", "window", "format", "into", "with", "select", "from", "final",
    "as", "intersect", "except", "create", "view", "in", "not", "and", "or")

  private def forAll[A](g: Gen[A], n: Int = 150)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  private val identGen: Gen[String] = (for {
    h <- Gen.alphaLowerChar
    t <- Gen.listOfN(6, Gen.alphaNumChar)
  } yield (h :: t).mkString).retryUntil(s => !keywords.contains(s), 100)

  private val tableGen: Gen[(String, String)] = for {
    qualified <- Gen.oneOf(true, false)
    db <- identGen
    t <- identGen
  } yield if (qualified) (s"$db.$t", s"$db.$t") else (t, s"test.$t")

  test("property: planted FROM/JOIN tables are extracted exactly") {
    val gen = for {
      tables <- Gen.listOfN(3, tableGen)
      styles <- Gen.listOfN(2, Gen.oneOf("JOIN", "LEFT JOIN", "CROSS JOIN", ","))
    } yield (tables.distinct, styles)
    forAll(gen) { case (tables, styles) =>
      val refs = tables.map(_._1)
      val from = refs.head +: refs.tail.zip(styles).map {
        case (r, ",") => s", $r"
        case (r, j) => s" $j $r ON 1 = 1"
      }
      val ddl = s"CREATE VIEW test.v AS SELECT * FROM ${from.mkString(" ")}"
      val expected = tables.map(_._2).distinct.sorted
      assert(LineageExtractor.tables(ddl, Some("test")) == expected, s"\nddl: $ddl")
    }
  }

  test("property: CTE names never leak into dependencies") {
    val gen = for {
      cte <- identGen
      inner <- tableGen
      outer <- tableGen
      if inner._1 != cte && outer._1 != cte
    } yield (cte, inner, outer)
    forAll(gen) { case (cte, inner, outer) =>
      val ddl =
        s"""CREATE VIEW test.v AS
           |WITH $cte AS (SELECT * FROM ${inner._1})
           |SELECT * FROM $cte JOIN ${outer._1} ON 1 = 1""".stripMargin
      val got = LineageExtractor.tables(ddl, Some("test"))
      val expected = Seq(inner._2, outer._2)
        .filterNot(n => Names.splitQualified(n)._2 == cte).distinct.sorted
      assert(got == expected, s"\nddl: $ddl")
      assert(!got.exists(n => Names.splitQualified(n)._2 == cte))
    }
  }

  test("property: table functions never contribute, their args never leak") {
    val gen = for {
      fn <- Gen.oneOf("s3", "remote", "url", "numbers", "file")
      real <- tableGen
    } yield (fn, real)
    forAll(gen) { case (fn, real) =>
      val ddl =
        s"""CREATE VIEW test.v AS
           |SELECT * FROM $fn('arg1', 'arg2') JOIN ${real._1} ON 1 = 1""".stripMargin
      assert(LineageExtractor.tables(ddl, Some("test")) == Seq(real._2),
        s"\nddl: $ddl")
    }
  }

  test("property: quoting is transparent") {
    forAll(Gen.zip(identGen, identGen)) { case (db, t) =>
      val plain = LineageExtractor.tables(
        s"CREATE VIEW test.v AS SELECT * FROM $db.$t", Some("test"))
      val ticked = LineageExtractor.tables(
        s"CREATE VIEW test.v AS SELECT * FROM `$db`.`$t`", Some("test"))
      val quoted = LineageExtractor.tables(
        s"""CREATE VIEW test.v AS SELECT * FROM "$db"."$t"""", Some("test"))
      assert(plain == ticked && ticked == quoted)
      assert(plain == Seq(s"$db.$t"))
    }
  }

  test("corpus: clause keywords after FROM don't break extraction") {
    val t = LineageExtractor.tables(
      """CREATE VIEW test.v AS
        |SELECT a, count(*) FROM test.base FINAL SAMPLE 0.1
        |PREWHERE a > 0 WHERE b < 2 GROUP BY a HAVING count(*) > 1
        |ORDER BY a LIMIT 10 SETTINGS max_threads = 4""".stripMargin, Some("test"))
    assert(t == Seq("test.base"))
  }

  test("corpus: UNION DISTINCT and nested subquery WITH") {
    val t = LineageExtractor.tables(
      """CREATE VIEW test.v AS
        |SELECT x FROM a UNION DISTINCT
        |SELECT x FROM (WITH c AS (SELECT 1) SELECT x FROM b)""".stripMargin,
      Some("test"))
    assert(t == Seq("test.a", "test.b"))
  }
}
