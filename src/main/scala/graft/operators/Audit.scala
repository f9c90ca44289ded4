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
  * frame is derived, never consulted.
  *
  * Cost: each stage adds one id-only anti-join, but every `lost`
  * branch's PLAN embeds the whole upstream stage chain, and
  * [[Audited.fates]] unions k + 1 such branches — Spark executes union
  * branches independently, so with `materialize = false` everywhere
  * stage 1 re-runs ~k times in the one fates action (O(k²) stage
  * executions). The default is therefore `materialize = true` (a
  * stage-output-sized `localCheckpoint`): each stage runs ONCE — at
  * `stage()` call time — and every downstream branch reads the pin; the
  * [[graft.queries.IncrementalOps]] q108 stage-boundary lesson, which
  * also covers operators with internal actions (bloom aggregates,
  * cluster rounds) re-deriving their input subtree per action. Pass
  * `materialize = false` only to keep a stage fully lazy (e.g. a
  * single-stage audit folded into a larger plan, or a caller that pins
  * its own boundaries) — and accept the quadratic re-execution if the
  * chain then grows.
  *
  * `idCol` must be non-null (anti-join keys never match on null, which
  * would tag a surviving null-id row as dropped by EVERY stage); the
  * contract is enforced at run time — a null id fails the stage with a
  * clear error instead of corrupting the attribution. */
case class Audited(survivors: DataFrame, drops: DataFrame, idCol: String) {

  /** Run `f` as the pipeline's next stage, attributing the rows it
    * dropped to `name`. */
  def stage(name: String, materialize: Boolean = true)(
      f: DataFrame => DataFrame): Audited = {
    val next0 = f(survivors)
    // LAZY pin: each stage still runs exactly once (cache-backed), but
    // materialization happens inside the first action over it — either
    // the next stage's internal actions or the fates/survivors run —
    // instead of paying one eager job per stage() call at construction
    // (measured r19: the audit chain is a sequence of tiny jobs and the
    // per-stage launch was a visible slice of q114)
    val next = if (materialize) next0.localCheckpoint(false) else next0
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
    * rows and be non-null (the usual dedup-pipeline contract — nulls are
    * rejected at run time, see the class doc). */
  def start(df: DataFrame, idCol: String): Audited =
    Audited(
      df.withColumn(idCol, when(col(idCol).isNotNull, col(idCol))
        .otherwise(raise_error(lit(
          s"Audit: '$idCol' must be non-null — a null id cannot be " +
            "attributed (anti-join keys never match on null)"))
          .cast(df.schema(idCol).dataType))),
      df.select(col(idCol)).limit(0).withColumn("dropped_by", lit("")),
      idCol)
}
