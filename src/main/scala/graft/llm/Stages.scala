package graft.llm

import org.apache.spark.sql.SparkSession

/** First-class accounting for the shared memoized PIPELINE STAGES
  * ([[Memo.stage]]): the 3-shingle signature table, the verified
  * near-pair table it feeds, and the connected-component labels built on
  * top (Dedup.scala / Pipeline.scala).
  *
  * In a real curation DAG these are write-once/read-many materializations
  * — a pipeline step, not part of any one query. But in a per-key bench
  * the whole build lands on whichever consumer runs FIRST alphabetically
  * (r8: llm_dedup_cluster's floor read 1.79× its real cost while every
  * sibling read near-zero — cost relocation the per-key gate then
  * mis-charges). [[warm]] lets Bench build the stages BEFORE the timed
  * loop and report each build as its own `stage:` line item, so consumer
  * keys time what a consumer actually does (read the stage) and the
  * stage cost is visible instead of smeared. */
object Stages {

  /** Materialize the shared stages in dependency order, returning
    * (stage line-item name, build seconds) per stage. Stage computes are
    * eager checkpoints, so entering the memo forces the build; re-entry
    * is a cache hit and costs ~0. */
  def warm(s: SparkSession, dir: String): Seq[(String, Double)] = {
    def timed(name: String)(body: => Any): (String, Double) = {
      val t0 = System.nanoTime()
      body
      name -> (System.nanoTime() - t0) / 1e9
    }
    Seq(
      timed("stage:shingles3") { Dedup.shingled(s, dir) },
      timed("stage:near_pairs") { Dedup.nearPairs(s, dir) },
      timed("stage:cluster_labels") { Pipeline.clusterLabels(s, dir) },
      timed("stage:co_supply_edges") {
        graft.operators.Analytics.coSupplyEdges(s, dir) },
      // r15: the array-native topDirCompute no longer touches the exploded
      // table, but llm_pca_explained / llm_abtt_apply still read it — warm
      // it as its own line item so the checkpoint doesn't land on the
      // alphabetically-first consumer (the r8 cost-relocation hazard).
      timed("stage:pca_exploded") { Spectral.explodedStage(s, dir) },
      timed("stage:pca_topdir") { Spectral.topDirStage(s, dir) })
  }
}
