package graft

import graft.sources.CommitLog

/** User TBLPROPERTIES as a log-governed facet: declared at CREATE,
  * SET/UNSET via ALTER TABLE, surfaced by SHOW TBLPROPERTIES, swapped
  * by REPLACE TABLE, rolled back by RESTORE, carried by SHALLOW
  * CLONE, and durable across checkpoints + vacuum. */
class TblPropertiesSpec extends SparkSpec {

  private lazy val wh = {
    val d = java.nio.file.Files.createTempDirectory("tblprop_wh").toString
    spark.conf.set("spark.sql.catalog.tp", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.tp.warehouse", d)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS tp.db")
    d
  }

  private def props(tbl: String): Map[String, String] =
    spark.sql(s"SHOW TBLPROPERTIES tp.db.$tbl").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap

  test("CREATE ... TBLPROPERTIES round-trips through SHOW; SET/UNSET alter it") {
    val _ = wh
    spark.sql("CREATE TABLE tp.db.a (k BIGINT) " +
      "TBLPROPERTIES('team'='data-eng', 'pii'='false')")
    assert(props("a").get("team").contains("data-eng"))
    assert(props("a").get("pii").contains("false"))
    // reserved keys stay computed (SHOW filters them; DESCRIBE shows)
    assert(spark.sql("DESCRIBE TABLE EXTENDED tp.db.a").collect()
      .exists(r => r.getString(1) != null && r.getString(1).contains("commitlog")))

    spark.sql("ALTER TABLE tp.db.a SET TBLPROPERTIES('pii'='true', 'tier'='gold')")
    assert(props("a").get("pii").contains("true"))
    assert(props("a").get("tier").contains("gold"))

    spark.sql("ALTER TABLE tp.db.a UNSET TBLPROPERTIES('team')")
    assert(!props("a").contains("team"))
    assert(props("a").get("tier").contains("gold"))
    // unicode + separators in VALUES are fine (base64 on the wire)
    spark.sql("ALTER TABLE tp.db.a SET TBLPROPERTIES('note'='a,b|c\"d é')")
    assert(props("a").get("note").contains("a,b|c\"d é"))
  }

  test("properties survive checkpoints and vacuum") {
    val _ = wh
    spark.sql("CREATE TABLE tp.db.b (k BIGINT) TBLPROPERTIES('x'='1')")
    val root = s"$wh/db/b"
    (1 to 12).foreach(i =>
      spark.sql(s"INSERT INTO tp.db.b VALUES ($i)"))
    CommitLog.vacuum(root, keepLast = 2, minAgeMs = 0)
    assert(CommitLog.tblPropsOf(root, CommitLog.latestVersion(root)) ==
      Map("x" -> "1"))
    assert(props("b").get("x").contains("1"))
  }

  test("REPLACE TABLE swaps the property set; RESTORE rolls it back") {
    val _ = wh
    spark.sql("CREATE TABLE tp.db.c (k BIGINT) TBLPROPERTIES('x'='old', 'keep'='y')")
    spark.sql("INSERT INTO tp.db.c VALUES (1)") // v2
    spark.sql("REPLACE TABLE tp.db.c (k BIGINT) TBLPROPERTIES('x'='new', 'z'='3')")
    assert(props("c").get("x").contains("new"))
    assert(props("c").get("z").contains("3"))
    assert(!props("c").contains("keep"))
    val root = s"$wh/db/c"
    CommitLog.restore(root, 2)
    assert(props("c").get("x").contains("old"))
    assert(props("c").get("keep").contains("y"))
    assert(!props("c").contains("z"))
  }

  test("shallow clone carries the source's properties") {
    val _ = wh
    spark.sql("CREATE TABLE tp.db.d (k BIGINT) TBLPROPERTIES('src'='d')")
    spark.sql("INSERT INTO tp.db.d VALUES (1)")
    spark.sql("CALL tp.system.clone(tbl => 'db.d', target => 'db.dc')")
    assert(props("dc").get("src").contains("d"))
  }

  test("reserved catalog keys are refused on SET") {
    val _ = wh
    spark.sql("CREATE TABLE tp.db.e (k BIGINT)")
    val err = intercept[Exception] {
      spark.sql("ALTER TABLE tp.db.e SET TBLPROPERTIES('provider'='x')")
    }
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    assert(chain(err).contains("reserved"), chain(err))
  }
}
