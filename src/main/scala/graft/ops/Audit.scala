package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Referential-integrity audit over a star/snowflake schema — the
  * data-quality gate an ingest runs BEFORE publishing a snapshot (the
  * dbt-test / Deequ relationship-check family as one bounded report):
  * per declared FK edge, the child row count, the orphan count (child
  * rows whose key finds no parent — NOT EXISTS semantics: a NULL child
  * key counts as an orphan, since an equality predicate never matches
  * NULL), the parent's distinct NON-NULL key count (count(DISTINCT pk)
  * semantics — a NULL parent key can never satisfy an FK, so it is not
  * a "key"), and how many parent key groups are duplicated (a "dim"
  * with repeated keys silently fans out every join against it; the NULL
  * group counts here — repeated NULL keys are a data defect too).
  *
  * Scale: each edge scans the child ONCE — the orphan count and the row
  * count come out of a single left join against the parent's DISTINCT
  * key list (one row per key, so the join cannot fan out even when the
  * parent has duplicate keys) followed by one bounded aggregate. At
  * 100 TB the fact-side edges are the cost, so halving their scans
  * matters; the parent side is two dim-sized passes (the key groupBy
  * feeds both the join list and the dup stats). AQE broadcasts
  * dim-sized parents; fact-fact edges shuffle on the key like any
  * equi-join. The report is |edges| rows — run it per ingest and diff
  * against yesterday's. */
object Audit {

  /** One FK edge declaration: `child.childKey` references
    * `parent.parentKey`. */
  final case class FkEdge(name: String, child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String)

  private def edgeReport(e: FkEdge): DataFrame = {
    // one row per distinct parent key (NULL group included) with its
    // multiplicity — feeds BOTH the orphan join (key list: distinct, so
    // no fanout) and the dup-key stats
    val pgrp = e.parent.groupBy(col(e.parentKey).as("_k"))
      .agg(count(lit(1)).as("_c"))
    // single child scan: left join against the distinct key list, then
    // count rows and unmatched rows in one aggregate. A NULL child key
    // never equals anything -> unmatched -> orphan (NOT EXISTS parity).
    val childStats = e.child.select(col(e.childKey).as("_k"))
      .join(pgrp.select(col("_k"), lit(true).as("_hit")), Seq("_k"), "left")
      .agg(count(lit(1)).cast(LongType).as("n_child"),
        sum(when(col("_hit").isNull, 1L).otherwise(0L)).cast(LongType)
          .as("n_orphan_child"))
    val pstats = pgrp.agg(
      count(col("_k")).cast(LongType).as("n_parent_keys"),
      sum(when(col("_c") > 1, 1L).otherwise(0L)).cast(LongType)
        .as("n_dup_parent_keys"))
    childStats.crossJoin(pstats)
      .select(lit(e.name).as("edge"), col("n_child"), col("n_orphan_child"),
        col("n_parent_keys"), col("n_dup_parent_keys"))
  }

  /** The audit report: one row per edge, in declaration order. */
  def fkAudit(edges: Seq[FkEdge]): DataFrame = {
    require(edges.nonEmpty, "fkAudit needs at least one edge")
    edges.map(edgeReport).reduce(_.unionByName(_))
  }
}
