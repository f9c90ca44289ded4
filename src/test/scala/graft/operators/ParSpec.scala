package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Par.widen — the kernel-entry scan-parallelism floor (r18). The
  * contract: values are ALWAYS identical (it is a bare round-robin
  * repartition or the identity), it fires only when the input's planned
  * parallelism is materially below the session's cores, and it never
  * touches streaming frames. */
class ParSpec extends SparkSpec {

  test("values unchanged, parallelism floored on a narrow input") {
    val df = spark.range(0, 1000, 1, numPartitions = 1)
      .select(col("id"), (col("id") % 7).as("k"))
    val w = Par.widen(df)
    assert(w.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
    assert(w.orderBy("id").collect().toSeq ==
      df.orderBy("id").collect().toSeq)
  }

  test("identity on an input already at session parallelism") {
    val cores = spark.sparkContext.defaultParallelism
    val df = spark.range(0, 1000, 1, numPartitions = cores).toDF()
    val w = Par.widen(df)
    // no new exchange in the plan — widen must not re-deal a wide input
    val exchanges = collectPlan(w.queryExecution.executedPlan) {
      case e: ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty, s"unexpected exchange: $exchanges")
  }

  test("identity on streaming frames") {
    val s = spark.readStream.format("rate").option("rowsPerSecond", "1").load()
    val w = Par.widen(s)
    assert(w eq s)
  }

  test("identity on non-narrow inputs (checkpoint / aggregate shapes)") {
    val ck = spark.range(0, 100, 1, numPartitions = 1).toDF()
      .localCheckpoint()
    assert(Par.widen(ck).rdd.getNumPartitions == ck.rdd.getNumPartitions)
    val agg = spark.range(0, 100, 1, numPartitions = 1).toDF()
      .groupBy(col("id") % 3).count()
    // aggregates are mid-pipeline frames — widen must not add a re-deal
    val before = agg.queryExecution.analyzed
    assert(Par.widen(agg).queryExecution.analyzed eq before)
  }

  test("disabled via spark.graft.kernel.widen=false") {
    spark.conf.set("spark.graft.kernel.widen", "false")
    try {
      val df = spark.range(0, 100, 1, numPartitions = 1).toDF()
      assert(Par.widen(df).rdd.getNumPartitions == 1)
    } finally spark.conf.unset("spark.graft.kernel.widen")
  }
}
