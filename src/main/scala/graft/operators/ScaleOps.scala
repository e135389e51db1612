package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale techniques the 100 TB plan needs when the defaults stop
  * working: key-salting for skewed shuffles and bucketing for
  * repeated co-located joins. These complement — not replace — AQE's
  * runtime skew-join splitting (`spark.sql.adaptive.skewJoin`):
  * salting is the plan-level fix when one key dominates so hard that
  * even a split partition can't hold it, or when the skewed side
  * feeds an aggregation rather than a join.
  */
object ScaleOps {

  /** Skew-safe equi-join: the big (skewed) side gets a uniform salt
    * in [0, numSalts); the small side is replicated once per salt
    * value, so each hot key's rows spread over numSalts reducers.
    * Result is exactly the plain join (salt values never affect the
    * match — every big row finds its replicated partner).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 numSalts: Int, joinType: String = "inner"): DataFrame = {
    require(numSalts > 0)
    val saltedBig = big.withColumn("__salt", (rand(42) * numSalts).cast("int"))
    val replSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(numSalts - 1))))
    saltedBig.join(replSmall, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Skew-safe additive aggregation (sum/count shapes): partial
    * aggregate on (keys, salt) — spreading a hot key over numSalts
    * reducers — then final aggregate on the keys. Only valid for
    * associative+commutative aggregates; sums and counts here.
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
                     numSalts: Int): DataFrame = {
    require(numSalts > 0)
    val keyCols = keys.map(col)
    df.withColumn("__salt", (rand(42) * numSalts).cast("int"))
      .groupBy((keyCols :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(keyCols: _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"), sum(col("__pcnt")).as("n"))
  }

  /** Write a table bucketed+sorted on the join key: repeated joins on
    * that key then read co-located buckets and skip the shuffle
    * entirely (the executed plan has no Exchange on the key — the
    * spec asserts exactly that).
    */
  def writeBucketed(df: DataFrame, tableName: String, bucketKey: String,
                    numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketKey)
      .sortBy(bucketKey)
      .format("parquet")
      .saveAsTable(tableName)

  /** Join two tables bucketed on the same key with the same bucket
    * count — shuffle-free by construction.
    */
  def coLocatedJoin(spark: org.apache.spark.sql.SparkSession,
                    leftTable: String, rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
