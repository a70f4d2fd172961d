package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def target = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)
  ).toDF("id", "name", "v")

  test("upsert: matched rows replaced whole, new rows inserted, rest untouched") {
    val src = Seq((2L, "B2", 200.0), (9L, "i", 90.0)).toDF("id", "name", "v")
    val out = Merge.upsert(target, src, Seq("id"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(out.toSeq == Seq((1L, "a", 10.0), (2L, "B2", 200.0), (3L, "c", 30.0), (9L, "i", 90.0)))
  }

  test("upsert: source column order differs from target — aligned by name") {
    val src = Seq(("B2", 2L, 200.0)).toDF("name", "id", "v")
    val out = Merge.upsert(target, src, Seq("id")).filter("id = 2").collect().head
    assert(out.getString(out.fieldIndex("name")) == "B2")
  }

  test("upsertColumns: only listed columns refresh on match; inserts land whole") {
    val src = Seq((2L, "SHOULD_NOT_LAND", 222.0), (9L, "i", 90.0)).toDF("id", "name", "v")
    val out = Merge.upsertColumns(target, src, Seq("id"), Seq("v"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    // id=2 keeps its target name but takes source v; id=9 inserts whole
    assert(out.toSeq == Seq((1L, "a", 10.0), (2L, "b", 222.0), (3L, "c", 30.0), (9L, "i", 90.0)))
  }

  test("upsertColumns: unknown update column rejected") {
    val src = Seq((2L, "x", 1.0)).toDF("id", "name", "v")
    intercept[IllegalArgumentException] {
      Merge.upsertColumns(target, src, Seq("id"), Seq("nope"))
    }
  }

  test("applyChanges: latest per key wins, deletes net out, I after D resurrects") {
    val changes = Seq(
      // id=1: U(seq1) then D(seq2) → gone
      (1L, "a1", 11.0, "U", 1L), (1L, "a1", 11.0, "D", 2L),
      // id=2: D(seq1) then I(seq2) → resurrected with new values
      (2L, "b2", 22.0, "D", 1L), (2L, "B2", 220.0, "I", 2L),
      // id=9: plain insert
      (9L, "i", 90.0, "I", 1L)
    ).toDF("id", "name", "v", "op", "seq")
    val out = Merge.applyChanges(target, changes, Seq("id"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(out.toSeq == Seq((2L, "B2", 220.0), (3L, "c", 30.0), (9L, "i", 90.0)))
  }

  test("applyChanges: sequence tie between upsert and delete converges to delete") {
    val changes = Seq(
      (1L, "a1", 11.0, "U", 5L), (1L, "a1", 11.0, "D", 5L)
    ).toDF("id", "name", "v", "op", "seq")
    val out = Merge.applyChanges(target, changes, Seq("id"))
    assert(out.filter("id = 1").count() == 0L)
  }

  test("applyChanges: equal-seq duplicate upserts pick the same winner under any partitioning") {
    val changes = Seq(
      (1L, null.asInstanceOf[String], 5.0, "U", 1L),
      (1L, "x", Double.NaN, "U", 1L)
    ).toDF("id", "name", "v", "op", "seq")
    def run(parts: Int) = Merge.applyChanges(target, changes.repartition(parts), Seq("id"))
      .filter("id = 1").collect().map(r => (r.isNullAt(1), r.getDouble(2).isNaN)).toSeq
    val winners = (1 to 8).map(run).distinct
    assert(winners.size == 1, s"partition-order-dependent winners: $winners")
  }

  test("applyChanges: map-typed payload columns are accepted") {
    val t = Seq((1L, Map("a" -> "1"))).toDF("id", "props")
    val changes = Seq((1L, Map("a" -> "2"), "U", 1L), (2L, Map("b" -> "3"), "I", 1L))
      .toDF("id", "props", "op", "seq")
    val out = Merge.applyChanges(t, changes, Seq("id")).orderBy("id").collect()
    assert(out.length == 2)
    assert(out(0).getMap[String, String](1)("a") == "2")
  }

  test("applyChanges: NULL or unrecognized op fails loudly instead of silently deleting/upserting") {
    // a NULL op used to make `op =!= 'D'` evaluate to NULL: the row was
    // dropped from upserts while its key still landed in `touched` — a
    // silent delete. Now every row outside I/U/D raises.
    val nullOp = Seq((1L, "a1", 11.0, null.asInstanceOf[String], 5L))
      .toDF("id", "name", "v", "op", "seq")
    val e1 = intercept[Exception] {
      Merge.applyChanges(target, nullOp, Seq("id")).collect()
    }
    assert(e1.getMessage.contains("must be I/U/D"))
    val badOp = Seq((1L, "a1", 11.0, "X", 5L)).toDF("id", "name", "v", "op", "seq")
    val e2 = intercept[Exception] {
      Merge.applyChanges(target, badOp, Seq("id")).collect()
    }
    assert(e2.getMessage.contains("must be I/U/D"))
  }

  test("applyChanges: window runs over the change batch, target side is anti-join only") {
    val changes = Seq((1L, "a1", 11.0, "U", 1L)).toDF("id", "name", "v", "op", "seq")
    val plan = Merge.applyChanges(target, changes, Seq("id"))
      .queryExecution.optimizedPlan.toString
    // exactly one Window node (latest-per-key over changes); the target
    // enters via LeftAnti, never under a Window or Sort
    assert("(?s)Window".r.findAllIn(plan).size == 1)
    assert(plan.contains("LeftAnti"))
  }
}
