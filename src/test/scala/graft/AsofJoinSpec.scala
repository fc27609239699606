package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._

import graft.operators.AsofJoin

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val left = Seq(
    (1L, "u1", ts("2024-01-01 10:00:00")),
    (2L, "u1", ts("2024-01-01 12:00:00")),
    (3L, "u2", ts("2024-01-01 09:00:00")),
    (4L, "u3", ts("2024-01-01 09:00:00"))
  ).toDF("id", "user", "t")

  private lazy val right = Seq(
    ("u1", ts("2024-01-01 09:30:00"), 10.0),
    ("u1", ts("2024-01-01 11:59:00"), 20.0),
    ("u2", ts("2024-01-01 09:00:00"), 30.0), // equal timestamp → inclusive match
    ("u2", ts("2024-01-01 10:00:00"), 40.0)  // after left → never matches
  ).toDF("ruser", "rt", "rv")

  test("asof picks most recent right row at or before left time, per key") {
    val out = AsofJoin(left, right, col("t"), col("rt"), by = Seq("user" -> "ruser"))
      .orderBy("id").collect()
    assert(out.map(r => (r.getLong(0), Option(r.get(4)))).toSeq == Seq(
      (1L, Some(10.0)),   // 10:00 → 09:30 row
      (2L, Some(20.0)),   // 12:00 → 11:59 row
      (3L, Some(30.0)),   // equal ts matches (inclusive)
      (4L, None)))        // u3 has no right rows → left-outer null
  }

  test("tolerance nulls out matches older than the bound") {
    val out = AsofJoin(left, right, col("t"), col("rt"),
      by = Seq("user" -> "ruser"), tolerance = Some("INTERVAL 10 MINUTES"))
      .orderBy("id").collect()
    assert(out.map(r => Option(r.get(4))).toSeq ==
      Seq(None, Some(20.0), Some(30.0), None)) // 30min-old match dropped, 1min kept
  }

  test("all left rows survive (left-outer semantics)") {
    val out = AsofJoin(left, right, col("t"), col("rt"), by = Seq("user" -> "ruser"))
    assert(out.count() == left.count())
  }
}
