package graft.queries

/** FuseRank-core queries (fused product encoding, query encoding, re-rank
  * pipeline) — populated as the encode/query/rerank modules land. */
object FuseRank {
  val qs: Seq[Q] = Seq.empty
}
