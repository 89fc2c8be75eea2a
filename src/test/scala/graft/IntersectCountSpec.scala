package graft

import org.apache.spark.sql.functions._

/** intersect_count(a, b) must equal size(array_intersect(a, b)) on
  * arbitrary inputs — that equality IS the licence for the L2 pair
  * verifies to use the native count (the decl hashes may not move). */
class IntersectCountSpec extends SparkSpec {

  private val rnd = new scala.util.Random(42)

  private def longCase(): (Seq[Option[Long]], Seq[Option[Long]]) = {
    def arr() = Seq.fill(rnd.nextInt(40))(
      if (rnd.nextInt(10) == 0) None
      else Some(rnd.nextInt(60).toLong - 30)) // dense range → collisions
    (arr(), arr())
  }

  private val words = Seq("a", "bb", "ccc", "déjà", "", "gram x",
    "gram y", "the quick", "日本語", "zz")
  private def strCase(): (Seq[Option[String]], Seq[Option[String]]) = {
    def arr() = Seq.fill(rnd.nextInt(30))(
      if (rnd.nextInt(10) == 0) None else Some(words(rnd.nextInt(words.size))))
    (arr(), arr())
  }

  test("intersect_count == size(array_intersect) on random bigint arrays") {
    import spark.implicits._
    val cases = Seq.fill(60)(longCase())
    val rows = cases.toDF("a", "b")
      .select(
        call_function("intersect_count", $"a", $"b").as("native"),
        size(array_intersect($"a", $"b")).as("reference"))
      .collect()
    rows.zip(cases).foreach { case (r, c) =>
      assert(r.getInt(0) == r.getInt(1), s"case=$c")
    }
  }

  test("intersect_count == size(array_intersect) on random string arrays") {
    import spark.implicits._
    val cases = Seq.fill(60)(strCase())
    val rows = cases.toDF("a", "b")
      .select(
        call_function("intersect_count", $"a", $"b").as("native"),
        size(array_intersect($"a", $"b")).as("reference"))
      .collect()
    rows.zip(cases).foreach { case (r, c) =>
      assert(r.getInt(0) == r.getInt(1), s"case=$c")
    }
  }

  test("whole-stage codegen path agrees over a generated column of pairs") {
    import spark.implicits._
    val df = spark.range(0, 500).select(
      expr("transform(sequence(0, cast(id % 37 as int)), i -> (id * 7 + i * 3) % 97)")
        .as("a"),
      expr("transform(sequence(0, cast((id + 11) % 29 as int)), i -> (id * 5 + i * 2) % 97)")
        .as("b"))
    val rows = df.select(
      call_function("intersect_count", $"a", $"b").as("native"),
      size(array_intersect($"a", $"b")).as("reference")).collect()
    assert(rows.length == 500)
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("duplicates count once; nulls match like array_intersect") {
    import spark.implicits._
    val cases = Seq(
      (Seq[Option[Long]](Some(1L), Some(1L), Some(2L)),
        Seq[Option[Long]](Some(1L), Some(3L))),
      (Seq[Option[Long]](None, Some(1L)), Seq[Option[Long]](None, None)),
      (Seq[Option[Long]](None), Seq[Option[Long]](Some(1L))),
      (Seq.empty[Option[Long]], Seq[Option[Long]](Some(1L), None)),
      (Seq[Option[Long]](Some(0L)), Seq[Option[Long]](Some(0L), Some(0L))))
    cases.foreach { case (a, b) =>
      val r = Seq((a, b)).toDF("a", "b")
        .select(
          call_function("intersect_count", $"a", $"b").as("native"),
          size(array_intersect($"a", $"b")).as("reference")).head
      assert(r.getInt(0) == r.getInt(1), s"a=$a b=$b")
    }
  }
}
