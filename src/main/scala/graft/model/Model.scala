package graft.model

/** Core data model of the metadata-analysis engine.
  *
  * Mirrors the reference's observable data shapes (see SURVEY.md §1):
  *  - catalog rows from `system.tables` (reference ch_view_dependencies.py:293-324)
  *  - the view→table dependency edge list (dependencies_to_mermaid.py:100-108)
  *  - Mermaid rendering options (dependencies_to_mermaid.py:10-18)
  */

/** One row of a `system.tables`-shaped catalog snapshot.
  * Reference: ch_view_dependencies.py:299-306 (views), 316-323 (tables),
  * 326-344 (DDL lookup). */
final case class CatalogObject(
    database: String,
    name: String,
    engine: String,
    create_table_query: Option[String]
) {
  def fqName: String = s"$database.$name"
}

/** A dependency edge: `src` (the referenced table/view) feeds `dst` (the view).
  * Direction fixed by the reference at dependencies_to_mermaid.py:108. */
final case class Edge(src: String, dst: String)

/** Per-view lineage result with the keep-going error channel
  * (reference ch_view_dependencies.py:346-361). */
final case class Lineage(view: String, deps: Seq[String], error: Option[String])

/** Options for Mermaid graph generation.
  * Defaults per reference dependencies_to_mermaid.py:10-18. */
final case class MermaidOptions(
    direction: String = "LR",
    indent: String = "  ",
    dedupeEdges: Boolean = true,
    includeIsolatedNodes: Boolean = true
)

/** Typed validation error matching the reference's
  * `MermaidDependencyGraphError` (dependencies_to_mermaid.py:21-22).
  * Messages are byte-identical to the reference's (tests assert on them). */
final class MermaidDependencyGraphError(msg: String) extends IllegalArgumentException(msg)

/** Raised when a DDL string cannot be processed at all
  * (reference raises RuntimeError at ch_view_dependencies.py:253-254). */
final class LineageParseException(msg: String) extends RuntimeException(msg)
