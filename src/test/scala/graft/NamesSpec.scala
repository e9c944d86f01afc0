package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.Names

/** Parity + property tests for identifier helpers
  * (reference ch_view_dependencies.py:65-98; SURVEY.md §1.3).
  * Property loops use ScalaCheck Gen directly (the scalatest-scalacheck
  * bridge artifact is not in the offline cache). */
class NamesSpec extends AnyFunSuite {

  /** Deterministic 200-sample property loop. */
  private def forAll[A](g: Gen[A])(f: A => Unit): Unit =
    (0 until 200).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  test("clean strips quoting") {
    assert(Names.clean("`table`") == "table")
    assert(Names.clean("\"table\"") == "table")
    assert(Names.clean("[table]") == "table")
    assert(Names.clean("  spaced  ") == "spaced")
    assert(Names.clean("a``b") == "a`b")
    assert(Names.clean("a\"\"b") == "a\"b")
    assert(Names.clean("plain") == "plain")
  }

  test("splitQualified") {
    assert(Names.splitQualified("db.t") == (Some("db"), "t"))
    assert(Names.splitQualified("`db`.`t`") == (Some("db"), "t"))
    assert(Names.splitQualified("t") == (None, "t"))
    // 3+-part quirk preserved: whole string treated as unqualified
    assert(Names.splitQualified("a.b.c") == (None, "a.b.c"))
    // trailing-dot edge: Python "a.".split(".") == ["a", ""]
    assert(Names.splitQualified("a.") == (Some("a"), ""))
  }

  test("normalize qualification") {
    assert(Names.normalize("db.t", Some("x")) == "db.t")
    assert(Names.normalize("t", Some("x")) == "x.t")
    assert(Names.normalize("t", None) == "t")
    // empty default db is falsy in the reference (Python truthiness)
    assert(Names.normalize("t", Some("")) == "t")
    assert(Names.normalize("`db`.`t`", None) == "db.t")
  }

  private val identGen: Gen[String] = for {
    h <- Gen.alphaChar
    t <- Gen.listOfN(7, Gen.alphaNumChar)
  } yield (h :: t).mkString

  test("property: clean is idempotent") {
    forAll(identGen) { s => assert(Names.clean(Names.clean(s)) == Names.clean(s)) }
  }

  test("property: backtick-quoting round-trips through clean") {
    forAll(identGen) { s => assert(Names.clean(s"`$s`") == s) }
  }

  test("property: normalize of qualified name ignores default db") {
    forAll(Gen.zip(identGen, identGen, identGen)) { case (db, t, dflt) =>
      assert(Names.normalize(s"$db.$t", Some(dflt)) == s"$db.$t")
    }
  }

  test("property: normalize of unqualified name uses default db") {
    forAll(Gen.zip(identGen, identGen)) { case (t, dflt) =>
      assert(Names.normalize(t, Some(dflt)) == s"$dflt.$t")
    }
  }
}
