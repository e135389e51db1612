package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class GtfsTimeSpec extends AnyFunSuite {

  private def parse(s: String): Long = GtfsTimeUtil.toSeconds(UTF8String.fromString(s))

  test(">24:00:00 service-day times parse (SURVEY §7.4 hazard 1)") {
    assert(parse("25:07:00") === 90420L)
    assert(parse("00:00:00") === 0L)
    assert(parse("09:09:30") === 32970L)
    assert(parse("123:00:59") === 442859L)
  }

  test("malformed strings → -1 (null at SQL level)") {
    for (bad <- Seq("", ":", "9:9:9x", "aa:bb:cc", "12:60:00", "12:00:60",
                    "12:00", "12:00:00:00", "12:0:00", " 12:00:00"))
      assert(parse(bad) === -1L, s"for '$bad'")
  }

  test("property: h*3600+m*60+s round-trips") {
    val prop = Prop.forAll(Gen.choose(0, 200), Gen.choose(0, 59), Gen.choose(0, 59)) {
      (h: Int, m: Int, s: Int) =>
        parse(f"$h%02d:$m%02d:$s%02d") == h * 3600L + m * 60L + s
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("expression works through Column API, SQL, and codegen") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq("25:07:00", "09:09:30", "garbage", null)
      .toDF("t")
    val viaColumn = df.select(GtfsTime.gtfsTimeToSeconds($"t").as("s"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getLong(0))
    assert(viaColumn.toSeq === Seq(90420L, 32970L, null, null))

    GtfsTime.register(spark)
    df.createOrReplaceTempView("times_v")
    val viaSql = spark.sql("SELECT gtfs_time_to_seconds(t) AS s FROM times_v")
      .collect().map(r => if (r.isNullAt(0)) null else r.getLong(0))
    assert(viaSql.toSeq === Seq(90420L, 32970L, null, null))
  }

  test("session extensions register the function; literal inputs constant-fold") {
    val spark = TestSpark.spark
    // no GtfsTime.register here — graft.GraftExtensions (set via
    // spark.sql.extensions at session build) must provide it
    val fresh = spark.newSession()
    assert(fresh.sql("SELECT gtfs_time_to_seconds('25:07:00') AS s")
      .collect().head.getLong(0) == 90420L)

    val optimized = fresh.sql("SELECT gtfs_time_to_seconds('09:00:00') AS s FROM range(3)")
      .queryExecution.optimizedPlan.toString
    assert(optimized.contains("32400"), s"literal must fold at optimization time:\n$optimized")
    assert(!optimized.contains("gtfs_time_to_seconds"))
  }
}
