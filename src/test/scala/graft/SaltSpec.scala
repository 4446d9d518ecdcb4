package graft

import org.apache.spark.sql.functions._

import graft.operators.Salt

class SaltSpec extends SparkSpec {

  /** skewed frame: key "hot" holds 10k rows spread over many partitions,
    * the rest are singletons.
    */
  private def skewed = spark.range(10100)
    .repartition(8)
    .select(
      when(col("id") < 10000, "hot").otherwise(concat(lit("k"), col("id"))).as("k"),
      col("id").as("v"))

  test("saltedCollect returns the same multiset as plain collect_list") {
    val plain = skewed.groupBy("k").agg(collect_list(col("v")).as("values"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).sorted).toMap
    val salted = Salt.saltedCollect(skewed, Seq("k"), col("v"), parts = 16)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).sorted).toMap
    assert(salted == plain)
  }

  test("saltedCollect distinct returns the same set as collect_set") {
    val dup = skewed.select(col("k"), pmod(col("v"), lit(7)).as("v"))
    val plain = dup.groupBy("k").agg(collect_set(col("v")).as("values"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).sorted).toMap
    val salted = Salt.saltedCollect(dup, Seq("k"), col("v"), parts = 16, distinct = true)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).sorted).toMap
    assert(salted == plain)
  }

  test("salting bounds the per-reducer group: no (key,salt) bucket holds the hot key whole") {
    // the observable contract of the first phase: the hot key splits into
    // multiple salt buckets, each strictly smaller than the full group
    val buckets = skewed
      .withColumn("__salt", pmod(spark_partition_id(), lit(16)))
      .groupBy("k", "__salt").count()
      .filter(col("k") === "hot")
      .collect().map(_.getLong(2))
    assert(buckets.length > 1, s"hot key landed in one bucket: ${buckets.toSeq}")
    assert(buckets.max < 10000, s"a bucket holds the whole hot key: ${buckets.toSeq}")
    assert(buckets.sum == 10000)
  }
}
