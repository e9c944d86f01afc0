package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model.{MermaidDependencyGraphError, MermaidOptions}
import graft.render.Mermaid

/** Port of all 16 reference tests (tests/test_mermaid_deps.py:1-155) with
  * identical inputs, expected substrings, and error-message regexes. */
class MermaidSpec extends AnyFunSuite {

  private def viewDeps(entries: (Any, Any)*): collection.Map[Any, Any] =
    scala.collection.mutable.LinkedHashMap[Any, Any]("view_dependencies" ->
      scala.collection.mutable.LinkedHashMap[Any, Any](entries: _*))

  test("happy path: edges, no quotes, class markers") { // test_mermaid_deps.py:12-52
    val data = scala.collection.mutable.LinkedHashMap[Any, Any](
      "view_dependencies" -> scala.collection.mutable.LinkedHashMap[Any, Any](
        "test.v_car_inventory" -> Vector("test.car", "test.household", "test.human"),
        "test.v_city_household_flag_stats" -> Vector("test.v_household_flags"),
        "test.v_household_flags" -> Vector("test.car", "test.household",
          "test.household_member", "test.pet"),
        "test.v_household_health_score" -> Vector("test.v_household_flags"),
        "test.v_household_roster" -> Vector("test.car", "test.household",
          "test.household_member", "test.pet")),
      "errors" -> scala.collection.mutable.LinkedHashMap[Any, Any]())
    val tables = Set("test.car", "test.household", "test.household_member",
      "test.pet", "test.human")
    val out = Mermaid.fromJsonValue(data, tables)
    assert(out.startsWith("graph LR\n"))
    assert(!out.contains("\""))
    assert(out.contains("  test.car -.-> test.v_car_inventory\n"))
    assert(out.contains("  test.v_household_flags -.-> test.v_city_household_flag_stats\n"))
    assert(out.contains("  test.v_household_flags -.-> test.v_household_health_score\n"))
    assert(out.contains("  test.car:::chTable"))
    assert(out.contains("  test.household:::chTable"))
    assert(out.contains("  test.v_household_flags:::chView"))
    assert(out.contains("  test.v_household_health_score:::chView"))
  }

  test("direction option changes header") { // :55-60
    val out = Mermaid.fromJsonValue(viewDeps("a" -> Vector("b")),
      options = MermaidOptions(direction = "TB"))
    assert(out.startsWith("graph TB\n"))
    assert(out.contains("  b -.-> a\n"))
    assert(!out.contains("\""))
  }

  private def countOf(hay: String, needle: String): Int =
    hay.sliding(needle.length).count(_ == needle)

  test("dedupe edges true removes duplicates, preserves first order") { // :63-70
    val out = Mermaid.fromJsonValue(viewDeps("a" -> Vector("b", "b", "c", "b")),
      options = MermaidOptions(dedupeEdges = true))
    assert(countOf(out, "  b -.-> a\n") == 1)
    assert(countOf(out, "  c -.-> a\n") == 1)
    // first-seen order: b edge before c edge
    assert(out.indexOf("  b -.-> a\n") < out.indexOf("  c -.-> a\n"))
  }

  test("dedupe edges false keeps duplicates") { // :73-77
    val out = Mermaid.fromJsonValue(viewDeps("a" -> Vector("b", "b")),
      options = MermaidOptions(dedupeEdges = false))
    assert(countOf(out, "  b -.-> a\n") == 2)
  }

  test("isolated nodes listed when edges exist") { // :80-86
    val out = Mermaid.fromJsonValue(
      viewDeps("a" -> Vector("b"), "isolated" -> Vector()),
      options = MermaidOptions(includeIsolatedNodes = true))
    assert(out.contains("  b -.-> a\n"))
    assert(out.contains("  isolated\n"))
  }

  test("isolated nodes omitted when disabled") { // :89-95
    val out = Mermaid.fromJsonValue(
      viewDeps("a" -> Vector("b"), "isolated" -> Vector()),
      options = MermaidOptions(includeIsolatedNodes = false))
    assert(out.contains("  b -.-> a\n"))
    assert(!out.contains("  isolated\n"))
  }

  test("no edges with isolated nodes true still lists nodes") { // :98-106
    val out = Mermaid.fromJsonValue(viewDeps("a" -> Vector(), "b" -> Vector()),
      options = MermaidOptions(includeIsolatedNodes = true))
    assert(out.startsWith("graph LR\n"))
    assert(out.contains("  a\n"))
    assert(out.contains("  b\n"))
    assert(!out.contains("-.->"))
  }

  test("missing view_dependencies key raises") { // :109-111
    val e = intercept[MermaidDependencyGraphError] {
      Mermaid.fromJsonValue(Map[Any, Any]("errors" -> Map()))
    }
    assert(e.getMessage.contains("Missing required key"))
  }

  test("view_dependencies not dict raises") { // :114-116
    val e = intercept[MermaidDependencyGraphError] {
      Mermaid.fromJsonValue(Map[Any, Any]("view_dependencies" -> Vector("nope")))
    }
    assert(e.getMessage.contains("must be a dictionary"))
  }

  test("view key not string raises") { // :119-121
    val e = intercept[MermaidDependencyGraphError] {
      Mermaid.fromJsonValue(Map[Any, Any]("view_dependencies" ->
        Map[Any, Any](123 -> Vector("a"))))
    }
    assert(e.getMessage.matches(".*keys.*must be strings.*"))
  }

  test("dependencies not list or null raises") { // :124-126
    val e = intercept[MermaidDependencyGraphError] {
      Mermaid.fromJsonValue(viewDeps("a" -> "b"))
    }
    assert(e.getMessage.contains("must be a list"))
  }

  test("dependencies list with non-string raises") { // :129-131
    val e = intercept[MermaidDependencyGraphError] {
      Mermaid.fromJsonValue(viewDeps("a" -> Vector("b", 1)))
    }
    assert(e.getMessage.contains("list of strings"))
  }

  test("null dependencies treated as empty list") { // :134-139
    val out = Mermaid.fromJsonValue(viewDeps("a" -> null))
    assert(out.startsWith("graph LR\n"))
    assert(out.contains("  a\n"))
    assert(!out.contains("-.->"))
  }

  test("invalid direction raises") { // :142-145
    val e = intercept[MermaidDependencyGraphError] {
      Mermaid.fromJsonValue(viewDeps("a" -> Vector("b")),
        options = MermaidOptions(direction = "DIAGONAL"))
    }
    assert(e.getMessage.contains("direction must be one of"))
  }

  test("invalid JSON string raises") { // :148-150
    val e = intercept[MermaidDependencyGraphError] {
      Mermaid.fromJsonString("{ this is not json }")
    }
    assert(e.getMessage.contains("Invalid JSON"))
  }

  test("top-level JSON not object raises") { // :153-155
    val e = intercept[MermaidDependencyGraphError] {
      Mermaid.fromJsonString("[\"not an object\"]")
    }
    assert(e.getMessage.contains("Top-level JSON must be an object"))
  }

  test("JSON string round-trip preserves field order") {
    val out = Mermaid.fromJsonString(
      """{"view_dependencies": {"z.v": ["z.t1"], "a.v": ["a.t1", "z.t1"]}}""")
    // first-seen node order: z.v before a.v
    assert(out.indexOf("z.v:::chView") < out.indexOf("a.v:::chView"))
    assert(out.contains("  z.t1 -.-> z.v\n"))
    assert(out.contains("  z.t1 -.-> a.v\n"))
  }
}
