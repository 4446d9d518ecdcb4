package graft

import org.apache.spark.sql.functions._

import graft.llm.Mix

class MixSpec extends SparkSpec {

  test("deterministic sampling: stable across runs and partitionings, ~rate") {
    import spark.implicits._
    val df = (0L until 20000L).toDF("id")
    val h = pmod(col("id") * lit(2654435761L), lit(1000000L))
    val a = Mix.sampleDeterministic(df, 0.3, h).select("id").as[Long].collect().toSet
    val b = Mix.sampleDeterministic(df.repartition(7), 0.3, h)
      .select("id").as[Long].collect().toSet
    assert(a == b) // partitioning-independent (df.sample is not)
    assert(math.abs(a.size / 20000.0 - 0.3) < 0.02, s"rate off: ${a.size}")
  }

  test("weighted mix unions independently sampled sources") {
    import spark.implicits._
    val df = (0L until 10000L).toDF("id")
    val h = pmod(col("id") * lit(2654435761L), lit(1000000L))
    val evens = df.filter(col("id") % 2 === 0)
    val odds = df.filter(col("id") % 2 === 1)
    val out = Mix.weighted(Seq((evens, 1.0, h), (odds, 0.0, h)))
      .select("id").as[Long].collect()
    assert(out.length == 5000 && out.forall(_ % 2 == 0))
    // rate bounds enforced
    intercept[IllegalArgumentException](Mix.sampleDeterministic(df, 1.5, h))
  }
}
