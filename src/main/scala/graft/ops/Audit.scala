package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Referential-integrity audit over a star/snowflake schema — the
  * data-quality gate an ingest runs BEFORE publishing a snapshot (the
  * dbt-test / Deequ relationship-check family as one bounded report):
  * per declared FK edge, the child row count, the orphan count (child
  * rows whose key finds no parent — NOT EXISTS semantics: a NULL child
  * key counts as an orphan, matching Spark's left_anti), the parent's
  * distinct key count, and how many parent keys are duplicated (a "dim"
  * with repeated keys silently fans out every join against it).
  *
  * Scale: each edge is one left-anti join (AQE broadcasts dim-sized
  * parents; fact-fact edges shuffle on the key like any equi-join) plus
  * two bounded aggregates; the report is |edges| rows — run it per
  * ingest and diff against yesterday's. */
object Audit {

  /** One FK edge declaration: `child.childKey` references
    * `parent.parentKey`. */
  final case class FkEdge(name: String, child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String)

  private def edgeReport(e: FkEdge): DataFrame = {
    val childKeys = e.child.select(col(e.childKey).as("_k"))
    val orphan = childKeys
      .join(e.parent.select(col(e.parentKey).as("_k")), Seq("_k"), "left_anti")
      .agg(count(lit(1)).cast(LongType).as("n_orphan_child"))
    val childN = e.child.agg(count(lit(1)).cast(LongType).as("n_child"))
    val pstats = e.parent.groupBy(col(e.parentKey)).agg(count(lit(1)).as("_c"))
      .agg(count(lit(1)).cast(LongType).as("n_parent_keys"),
        sum(when(col("_c") > 1, 1L).otherwise(0L)).cast(LongType)
          .as("n_dup_parent_keys"))
    childN.crossJoin(orphan).crossJoin(pstats)
      .select(lit(e.name).as("edge"), col("n_child"), col("n_orphan_child"),
        col("n_parent_keys"), col("n_dup_parent_keys"))
  }

  /** The audit report: one row per edge, in declaration order. */
  def fkAudit(edges: Seq[FkEdge]): DataFrame = {
    require(edges.nonEmpty, "fkAudit needs at least one edge")
    edges.map(edgeReport).reduce(_.unionByName(_))
  }
}
