package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AuditSpec extends SparkSpec {
  import spark.implicits._

  test("fkAudit: detects planted orphans, null keys, and duplicated parent keys") {
    val child = Seq((1L, 10L), (2L, 10L), (3L, 99L), (4L, 20L))
      .toDF("id", "fk")
      // a NULL child key matches no parent: NOT-EXISTS semantics -> orphan
      .unionByName(Seq((5L, Option.empty[Long])).toDF("id", "fk"))
    val parent = Seq((10L, "a"), (20L, "b"), (20L, "b2"), (30L, "c"))
      .toDF("pk", "v")
    val out = Audit.fkAudit(Seq(
      Audit.FkEdge("child.fk", child, "fk", parent, "pk")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // 5 child rows; orphans = id 3 (fk 99 unmatched) + id 5 (null fk);
    // parent has 3 distinct keys, one of them (20) duplicated
    assert(out.toSeq == Seq(("child.fk", 5L, 2L, 3L, 1L)))
  }

  test("fkAudit: multi-edge report preserves declaration order and clean edges report zeros") {
    val a = Seq((1L, 10L)).toDF("id", "fk")
    val p = Seq((10L, "x")).toDF("pk", "v")
    val out = Audit.fkAudit(Seq(
      Audit.FkEdge("e1", a, "fk", p, "pk"),
      Audit.FkEdge("e2", a, "id", p, "pk")))
      .collect().map(r => (r.getString(0), r.getLong(2)))
    assert(out.toSeq == Seq(("e1", 0L), ("e2", 1L)))
  }
}
