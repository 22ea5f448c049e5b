package graft.queries

/** All driver-checkable queries. Each Q with an oracle participates in the
  * DuckDB hash-match; oracle-less queries get the weaker rows-only check.
  */
object Registry {
  def all: Seq[Q] =
    Relational.qs ++ Vectors.qs ++ TextDedup.qs ++ GeoQueries.qs ++
      FuseRank.qs ++ RerankQueries.qs ++ Extended.qs ++ Restaurants.qs ++
      Flipkart.qs ++ EvalQueries.qs ++ Media.qs ++ Pipeline.qs ++
      SqlSurface.qs ++ Ingest.qs

  def duplicateNames: Seq[String] =
    all.groupBy(_.name).collect { case (n, qs) if qs.size > 1 => n }.toSeq
}
