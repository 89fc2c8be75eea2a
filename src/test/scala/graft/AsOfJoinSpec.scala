package graft

import graft.operators.AsOfJoin
import java.sql.Timestamp

/** Edge semantics of the generic as-of join. */
class AsOfJoinSpec extends SparkSpec {

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  test("matches latest at-or-before; unmatched rows get null; inclusive ties") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts(5)),  // after r at 3 -> matched to 3
      (2L, 10L, ts(2)),  // before any right -> null
      (3L, 10L, ts(8)),  // after r at 3 and 8 -> matched to 8 (tie inclusive)
      (4L, 20L, ts(9))   // key with no right rows -> null
    ).toDF("id", "k", "t")
    val right = Seq(
      (100L, 10L, ts(3)),
      (101L, 10L, ts(8))
    ).toDF("rid", "k", "rt")

    val out = AsOfJoin(left, right, keys = Seq("k"),
        leftTime = "t", rightTime = "rt", payload = Seq("rid"))
      .select($"id", $"asof_rid").as[(Long, Option[Long])]
      .collect().toMap

    assert(out == Map(
      1L -> Some(100L),
      2L -> None,
      3L -> Some(101L),
      4L -> None))
  }

  test("NULL payload on the matched right row is preserved; multi-column payloads come from the same right row") {
    import spark.implicits._
    val left = Seq((1L, 10L, ts(9))).toDF("id", "k", "t")
    // older right row has (100, "a"); the MATCHED row (ts 5) carries a
    // legitimately NULL rid and tag "b" — the attach must be (null, "b"),
    // never the older row's rid nor a column mix of the two rows
    val right = Seq(
      (Option(100L), Option("a"), 10L, ts(3)),
      (Option.empty[Long], Option("b"), 10L, ts(5))
    ).toDF("rid", "tag", "k", "rt")

    val out = AsOfJoin(left, right, keys = Seq("k"),
        leftTime = "t", rightTime = "rt", payload = Seq("rid", "tag"))
      .select($"asof_rid", $"asof_tag").as[(Option[Long], Option[String])]
      .collect().toSeq

    assert(out == Seq((None, Some("b"))),
      s"payload must come intact from the matched row: $out")
  }

  test("left row count is preserved (left-join semantics)") {
    import spark.implicits._
    val ev = Tables(spark, sf0001, "events")
      .select($"event_id", $"user_id", $"ts", $"event_type")
    val purchases = ev.filter($"event_type" === "purchase").drop("event_type")
    val signups = ev.filter($"event_type" === "signup").drop("event_type")
      .withColumnRenamed("event_id", "sid")
    val joined = AsOfJoin(purchases, signups, Seq("user_id"), "ts", "ts", Seq("sid"))
    assert(joined.count() == purchases.count())
  }
}
