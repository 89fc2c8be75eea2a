package graft

import org.apache.spark.sql.functions._

/** Md5Prefix32/Md5Words32 must equal the hex-parse SQL formula the
  * DuckDB oracles state, byte for byte, on arbitrary strings — that
  * equality IS the licence for Qh.phash to use the native path. */
class PortableHashSpec extends SparkSpec {

  private val samples = Seq(
    "", "a", "hello world", "the quick brown fox", "#0", "x#1",
    "ünïcødé ≈ test", "日本語テキスト", "a b c d e f g",
    "0123456789" * 30, "tab\tnewline\nquote'backslash\\")

  test("md5_prefix32(s, seed) == conv(substring(md5(concat(s,'#seed')),1,8),16,10)") {
    import spark.implicits._
    for (seed <- Seq(0, 1, 3, 7, 11, 13)) {
      val rows = samples.toDF("s")
        .select(
          call_function("md5_prefix32", $"s", lit(seed)).as("native"),
          conv(substring(md5(concat($"s", lit(s"#$seed"))), 1, 8), 16, 10)
            .cast("bigint").as("formula"))
        .collect()
      rows.foreach(r => assert(r.getLong(0) == r.getLong(1),
        s"seed=$seed native=${r.getLong(0)} formula=${r.getLong(1)}"))
    }
  }

  test("md5_words32(s, seed)[j] == hex slice j of the digest") {
    import spark.implicits._
    for (j <- 0 until 4) {
      val rows = samples.toDF("s")
        .select(
          element_at(call_function("md5_words32", $"s", lit(1)), j + 1).as("native"),
          conv(substring(md5(concat($"s", lit("#1"))), 1 + 8 * j, 8), 16, 10)
            .cast("bigint").as("formula"))
        .collect()
      rows.foreach(r => assert(r.getLong(0) == r.getLong(1),
        s"word $j: native=${r.getLong(0)} formula=${r.getLong(1)}"))
    }
  }

  test("bin_word32(bin, i) == conv(hex(substring(bin, i+1, 4)), 16, 10), incl. short tails") {
    import spark.implicits._
    val rows = samples.filter(_.nonEmpty).toDF("s")
      .select($"s".cast("binary").as("bin"),
        explode(sequence(lit(0), length($"s") - 1)).as("i"))
      .select(
        call_function("bin_word32", $"bin", $"i").as("native"),
        conv(hex(expr("substring(bin, i + 1, 4)")), 16, 10)
          .cast("bigint").as("formula"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1),
      s"native=${r.getLong(0)} formula=${r.getLong(1)}"))
  }

  test("codegen and interpreted paths agree") {
    import spark.implicits._
    val df = samples.toDF("s")
    val withCodegen = df.select(call_function("md5_prefix32", $"s", lit(5)))
      .collect().map(_.getLong(0)).toSeq
    val interpreted = samples.map(s =>
      graft.functions.PortableHash.prefix(
        org.apache.spark.unsafe.types.UTF8String.fromString(s), 5))
    assert(withCodegen == interpreted)
  }
}
