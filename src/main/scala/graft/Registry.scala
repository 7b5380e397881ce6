package graft

/** Single assembly point for the SURVEY §2 inventory. Order follows the
  * survey sections; keys are stable contract strings — never rename. */
object Registry {
  val all: Seq[(String, Q)] =
    sources.Scans.qs ++
    operators.Filters.qs ++
    operators.Joins.qs ++
    operators.Aggs.qs ++
    operators.Windows.qs ++
    operators.SetOps.qs ++
    operators.EventsBatch.qs ++
    operators.Geo.qs ++
    operators.Analytics.qs ++
    operators.Insights.qs ++
    operators.Trends.qs ++
    operators.Profiling.qs ++
    functions.Funcs.qs ++
    functions.Custom.qs ++
    llm.Dedup.qs ++
    llm.Similarity.qs ++
    llm.TextAnalysis.qs ++
    llm.Multimodal.qs ++
    llm.Pipeline.qs ++
    llm.Curation.qs ++
    llm.Screens.qs ++
    llm.Signals.qs ++
    llm.Spectral.qs ++
    llm.Training.qs

  lazy val byName: Map[String, Q] = all.toMap

  require(all.map(_._1).distinct.size == all.size, "duplicate query keys")
}
