package graft.queries

import graft.QueryDef

/** Assembly point for the per-family query registries. */
object Registry {
  def all: Seq[QueryDef] =
    Relational.defs ++ Scalars.defs ++ Pipeline.defs ++ Extras.defs ++
      Curation.defs ++ Ml.defs
}
