package graft.operators

import graft.GraftQuery

/** Text analysis suite (north-star: lang-ID, quality scoring, token counts,
  * fingerprinting). Filled in incrementally. */
object TextAnalysis {
  def queries: Seq[GraftQuery] = Seq()
}
