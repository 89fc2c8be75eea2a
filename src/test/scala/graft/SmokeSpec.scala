package graft

/** SURVEY §5 t1: every declared query runs end-to-end on sf0.001 with a
  * non-empty schema; the flagship pipeline returns enveloped rows. */
class SmokeSpec extends SparkSpec {

  for (d <- SparkEntry.all) {
    test(s"t1 smoke: ${d.name}") {
      val df = d.build(spark, sf0001)
      assert(df.schema.nonEmpty, s"${d.name}: empty schema")
      val n = df.count()
      assert(n >= 0)
      // queries that must be non-empty on the fixtures (everything except
      // genuinely-selective pair queries which may legitimately be empty
      // at the smallest scale)
      val mayBeEmpty = Set("l2_lsh_pairs", "l2_ngram_jaccard", "o4_except")
      if (!mayBeEmpty(d.name))
        assert(n > 0, s"${d.name}: expected rows on sf0.001, got 0")
    }
  }

  test("flagship entry() returns enveloped rows") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.nonEmpty)
    val v = rows.head.getString(0)
    assert(v.contains("\"source\":\"database\""), s"envelope missing source: $v")
    assert(v.contains("\"data\":"), s"envelope missing data: $v")
  }

  test("every oracle key has a matching query") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet -- qs
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("query names are unique across modules") {
    val names = SparkEntry.all.map(_.name)
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate decl names: $dups")
  }
}
