package graft.queries

import org.apache.spark.sql.functions._

/** SURVEY §2.B O1–O4 — sort / limit / set-operation surface.
  *
  * Scale notes:
  *  - O1 global top-k compiles to TakeOrderedAndProject: per-partition
  *    heaps + a k-row driver merge — NEVER a global sort of 100 TB.
  *  - O2 is reference behavior R5 (kafka-database-import.go:180-185,
  *    client-side MaxRecs). The reference's off-by-one (250,001 rows) is
  *    documented, not reproduced; checked by count, not row identity.
  *  - O3/O4: UNION ALL is a zero-shuffle concatenation; UNION/INTERSECT/
  *    EXCEPT hash-shuffle on the full row — kept to key columns so the
  *    shuffle payload is minimal.
  */
object SetOps {

  val decls: Seq[Decl] = Seq(

    Decl(
      "o1_topk",
      """SELECT o_orderkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 10""".stripMargin) { (s, dir) =>
      import s.implicits._
      Qh.t(s, dir, "orders")
        .select($"o_orderkey", $"o_totalprice")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .limit(10)
    },

    // Limit without sort: row identity is engine-defined, so the contract
    // is the COUNT (SURVEY §5 determinism rules).
    Decl(
      "o2_limit",
      """SELECT count(*) AS n
        |FROM (SELECT * FROM lineitem LIMIT 1000)""".stripMargin) { (s, dir) =>
      Qh.t(s, dir, "lineitem")
        .limit(1000)
        .agg(count(lit(1)).as("n"))
    },

    Decl(
      "o3_union",
      """SELECT o_orderkey, 'urgent' AS tag FROM orders WHERE o_orderpriority = '1-URGENT'
        |UNION ALL
        |SELECT o_orderkey, 'big' AS tag FROM orders WHERE o_totalprice > 400000
        |ORDER BY o_orderkey, tag""".stripMargin) { (s, dir) =>
      import s.implicits._
      val o = Qh.t(s, dir, "orders")
      val urgent = o.filter($"o_orderpriority" === "1-URGENT")
        .select($"o_orderkey", lit("urgent").as("tag"))
      val big = o.filter($"o_totalprice" > 400000)
        .select($"o_orderkey", lit("big").as("tag"))
      urgent.unionAll(big).orderBy("o_orderkey", "tag")
    },

    Decl(
      "o3_union_distinct",
      """SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |UNION
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_custkey""".stripMargin) { (s, dir) =>
      import s.implicits._
      val o = Qh.t(s, dir, "orders")
      o.filter($"o_orderpriority" === "1-URGENT").select($"o_custkey")
        .union(o.filter($"o_orderstatus" === "F").select($"o_custkey"))
        .distinct()
        .orderBy("o_custkey")
    },

    Decl(
      "o4_intersect",
      """SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_custkey""".stripMargin) { (s, dir) =>
      import s.implicits._
      val o = Qh.t(s, dir, "orders")
      o.filter($"o_orderpriority" === "1-URGENT").select($"o_custkey")
        .intersect(o.filter($"o_orderstatus" === "O").select($"o_custkey"))
        .orderBy("o_custkey")
    },

    Decl(
      "o4_except",
      """SELECT c_custkey FROM customer
        |EXCEPT
        |SELECT o_custkey AS c_custkey FROM orders
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      import s.implicits._
      Qh.t(s, dir, "customer").select($"c_custkey")
        .except(Qh.t(s, dir, "orders").select($"o_custkey".as("c_custkey")))
        .orderBy("c_custkey")
    },

    // O4b: the multiset (ALL) variants — bag semantics preserve
    // duplicate counts, which matters when the inputs are fact streams
    // rather than key sets (e.g. per-order line multiplicities).
    Decl(
      "o4_intersect_all",
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |INTERSECT ALL
        |SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY o_custkey""".stripMargin) { (s, dir) =>
      import s.implicits._
      val o = Qh.t(s, dir, "orders")
      o.filter($"o_orderstatus" === "O").select($"o_custkey")
        .intersectAll(o.filter($"o_orderpriority" === "1-URGENT").select($"o_custkey"))
        .orderBy("o_custkey")
    },

    Decl(
      "o4_except_all",
      """SELECT o_custkey FROM orders
        |EXCEPT ALL
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_custkey""".stripMargin) { (s, dir) =>
      import s.implicits._
      val o = Qh.t(s, dir, "orders")
      o.select($"o_custkey")
        .exceptAll(o.filter($"o_orderstatus" === "F").select($"o_custkey"))
        .orderBy("o_custkey")
    }
  )
}
