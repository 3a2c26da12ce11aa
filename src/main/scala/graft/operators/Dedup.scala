package graft.operators

import graft.GraftQuery

/** Deduplication operator suite (SURVEY §2.3, north-star dedup family):
  * exact, MinHash+LSH, SimHash, n-gram Jaccard. Filled in incrementally. */
object Dedup {
  def queries: Seq[GraftQuery] = Seq()
}
