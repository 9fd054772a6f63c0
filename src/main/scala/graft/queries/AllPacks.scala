package graft.queries

/** Aggregates every [[QueryPack]] into the driver contract maps consumed by
  * [[graft.SparkEntry]]. Adding a pack here is the single registration step.
  */
object AllPacks {
  def packs: Seq[QueryPack] = Seq(
    RelationalPack,
    SubqueryPack,
    TextPack,
    DedupPack,
    SimilarityPack,
    EventsPack,
    FeaturePack,
    MultimodalPack,
    StatsPack,
    PipelinePack,
    GeoPack,
    GraphPack
  )

  lazy val all: Seq[Q] = {
    val qs = packs.flatMap(_.queries)
    val dup = qs.groupBy(_.name).collect { case (n, g) if g.size > 1 => n }
    require(dup.isEmpty, s"duplicate query names: ${dup.mkString(",")}")
    qs
  }

  lazy val queries: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] =
    all.map(q => q.name -> q.run).toMap

  lazy val oracles: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
