package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract checks on the driver-facing registry: the queries/oracle
  * maps are merged with ++, so a duplicate key across modules would
  * silently SHADOW an operator (its query would vanish from the
  * correctness gate with no error anywhere). Also: every oracle must
  * point at a registered query, and names must parse for the driver.
  */
class SparkEntrySpec extends AnyFunSuite {

  private val parts: Seq[(String, Map[String, _])] = Seq(
    "Relational" -> graft.queries.Relational.queries,
    "Analytics" -> graft.queries.Analytics.queries,
    "SqlSurface" -> graft.queries.SqlSurface.queries,
    "Temporal" -> graft.queries.Temporal.queries,
    "Spatial" -> graft.queries.Spatial.queries,
    "Graph" -> graft.queries.Graph.queries,
    "ScaleOps" -> graft.operators.ScaleOps.queries,
    "DataQuality" -> graft.operators.DataQuality.queries,
    "Sketches" -> graft.llm.Sketches.queries,
    "TextAnalysis" -> graft.llm.TextAnalysis.queries,
    "Dedup" -> graft.llm.Dedup.queries,
    "Chunking" -> graft.llm.Chunking.queries,
    "Similarity" -> graft.llm.Similarity.queries,
    "Evaluation" -> graft.llm.Evaluation.queries,
    "Multimodal" -> graft.llm.Multimodal.queries,
    "CorpusPipeline" -> graft.llm.CorpusPipeline.queries,
    "DataPrep" -> graft.llm.DataPrep.queries,
    "KpiHarness" -> graft.gtfs.KpiHarness.queries)

  test("no query key is shadowed by the module merge") {
    val all = parts.flatMap { case (mod, m) => m.keys.map(_ -> mod) }
    val dups = all.groupBy(_._1).filter(_._2.size > 1)
    assert(dups.isEmpty,
      s"duplicate query keys across modules: " +
        dups.map { case (k, ms) => s"$k in ${ms.map(_._2).mkString("+")}" }.mkString(", "))
    assert(SparkEntry.queries.size == all.size)
  }

  test("every oracle references a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("query names follow the driver's q<number>_<slug> convention") {
    val bad = SparkEntry.queries.keys.filterNot(_.matches("q\\d+_[a-z0-9_]+"))
    assert(bad.isEmpty, s"non-conforming names: $bad")
  }

  test("oracle SQL contains no tab characters (driver JSON-escape hazard)") {
    val tabs = SparkEntry.oracleSql.filter(_._2.contains("\t")).keys
    assert(tabs.isEmpty, s"oracles with tabs: $tabs")
  }
}
