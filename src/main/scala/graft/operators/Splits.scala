package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines.
  *
  * Content-addressed: the split is a pure function of the id (md5 bucket
  * 0..99), so assignments are stable across reruns, cluster sizes, and
  * engines — unlike `randomSplit`, whose assignment depends on partition
  * layout and seed plumbing. Buckets use the leading 32 md5 bits, the
  * same cross-engine-reproducible construction as the MinHash bands.
  */
object Splits {

  /** 0..99 bucket from the id's md5 (uniform for any id distribution). */
  def bucket(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long") % 100

  /** Adds a `split` column: train/val/test at trainPct/valPct/rest. */
  def assign(df: DataFrame, idCol: String, trainPct: Int = 90, valPct: Int = 5): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100)
    val b = bucket(col(idCol))
    df.withColumn("split",
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }
}
