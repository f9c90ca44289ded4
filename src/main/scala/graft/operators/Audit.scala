package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Drop-reason provenance for pipeline compositions — the first thing a
  * curation team asks when a source's yield drops is "which stage
  * dropped these documents, and why?", and a pipeline built from
  * anti-joins answers it with silence. An [[Audited]] pipeline threads
  * a (id, dropped_by) frame alongside the survivors: every
  * [[Audited.stage]] runs its transform unchanged and tags the rows the
  * stage removed with the stage's name, so the end of the pipeline
  * holds BOTH the admitted set and a complete account of the losers —
  * each document attributed to the FIRST stage that dropped it (later
  * stages never see it again, so attribution is unambiguous by
  * construction).
  *
  * Auditing cannot change results: survivors are exactly the
  * composition of the stage functions (spec-pinned), and the audit
  * frame is derived, never consulted. Cost is one id-only anti-join per
  * stage (build side = that stage's survivors' ids, narrow); at corpus
  * scale run audits on the id column alone, which is what the frame
  * carries.
  *
  * Stage inputs that feed operators with internal actions (bloom
  * aggregates, cluster rounds) should pass `materialize = true` — the
  * [[graft.queries.IncrementalOps]] q108 stage-boundary lesson: a
  * composed stage whose input subtree contains actions re-derives that
  * subtree once per downstream action. The checkpoint is stage-output
  * (batch)-sized. */
case class Audited(survivors: DataFrame, drops: DataFrame, idCol: String) {

  /** Run `f` as the pipeline's next stage, attributing the rows it
    * dropped to `name`. */
  def stage(name: String, materialize: Boolean = false)(
      f: DataFrame => DataFrame): Audited = {
    val next0 = f(survivors)
    val next = if (materialize) next0.localCheckpoint() else next0
    val lost = survivors.select(col(idCol))
      .join(next.select(col(idCol)), Seq(idCol), "left_anti")
      .withColumn("dropped_by", lit(name))
    Audited(next, drops.unionByName(lost), idCol)
  }

  /** Every input row's fate: (`idCol`, fate) with fate = the dropping
    * stage's name, or "admitted" — the audit report, one row per
    * document that ever entered the pipeline. */
  def fates: DataFrame = {
    val admitted = survivors.select(col(idCol))
      .withColumn("fate", lit("admitted"))
    drops.select(col(idCol), col("dropped_by").as("fate"))
      .unionByName(admitted)
  }
}

object Audit {
  /** Begin an audited pipeline over `df`; `idCol` must uniquely identify
    * rows (the usual dedup-pipeline contract). */
  def start(df: DataFrame, idCol: String): Audited =
    Audited(df,
      df.select(col(idCol)).limit(0).withColumn("dropped_by", lit("")),
      idCol)
}
