package graft.operators

import graft.GraftQuery

/** Multimodal binary-column plumbing (north-star). Filled in incrementally. */
object Multimodal {
  def queries: Seq[GraftQuery] = Seq()
}
