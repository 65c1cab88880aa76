package graft

/** Central inventory of implemented operators (SURVEY.md §2). */
object Registry {
  def all: Seq[QueryDef] =
    queries.Relational.defs ++ queries.Matchbox.defs ++ queries.Pipeline.defs ++
      queries.Streaming.defs ++ queries.Sources.defs ++ queries.Selection.defs ++ queries.Ann.defs ++
      queries.Search.defs

  def byName: Map[String, QueryDef] = all.map(d => d.name -> d).toMap
}
