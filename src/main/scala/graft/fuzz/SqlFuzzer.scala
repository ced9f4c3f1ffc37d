package graft.fuzz

import scala.util.Random

/** Seeded generator of engine-portable SQL plans for randomized
  * differential testing (round-13 verdict next-#1: the 238 curated oracles
  * can only catch bugs someone thought to write a query for; a seeded
  * generator covers planner edge cases the curated set misses).
  *
  * Each plan is ONE SQL string executed verbatim by BOTH Spark SQL
  * (graft.FuzzMain) and DuckDB (tools/compare_oracle.py) over the driver's
  * parquet tables; results are compared row-for-row. The grammar covers
  * filter/project/distinct, group-agg (+HAVING), inner/left equi-joins,
  * analytic windows (row_number/rank/dense_rank/lag + running sum), set
  * ops (UNION ALL / INTERSECT / EXCEPT), nested derived tables with
  * post-agg filters, and (round 17) correlated LATERAL subqueries in FROM
  * plus QUALIFY-pattern windowed filtering — the relational core where a
  * planner bug (pushdown through the wrong projection, a misfired join
  * reorder, a bad null-frame, a mis-decorrelated lateral) would silently
  * corrupt results.
  *
  * Portability rules (the repo's hard-won oracle rules — PLANS.md and the
  * round playbook; each was learned from a red row):
  *  - payload columns are BIGINT/INT/STRING only; SUM always carries an
  *    outer CAST(... AS BIGINT) — DuckDB widens sum(BIGINT) to HUGEINT,
  *    which the pandas read renders as float64 (round-8's two red rows)
  *  - doubles enter integer space ONLY via CAST(FLOOR(x) AS BIGINT):
  *    a direct double→BIGINT cast truncates in Spark but ROUNDS in DuckDB;
  *    floor-then-cast is exact in both
  *  - every ORDER BY key spells ASC/DESC AND NULLS FIRST/LAST (Spark
  *    defaults ASC→NULLS FIRST, DuckDB ASC→NULLS LAST), and orders the
  *    FULL output column list before any LIMIT so the cut prefix is a
  *    deterministic multiset even with duplicate rows
  *  - selective predicates are modulo-form ((col % k) cmp r): selectivity
  *    is data-range-independent and the arithmetic is exact in both engines
  *  - row_number ORDER BY keys always include the table's unique key;
  *    rank/dense_rank may order by non-unique expressions (per-row rank
  *    over a multiset is deterministic even under ties)
  *  - timestamps never reach the payload; they enter only via year(ts)
  *    (both engines: exact integer)
  *
  * Determinism: java.util.Random's LCG is specified by the JDK spec, so
  * (seed, index) → SQL is stable across hosts; the committed artifact
  * records the seed and every plan is reproducible from it.
  */
object SqlFuzzer {

  final case class Col(name: String, kind: String) // long | int | double | string | ts
  final case class Tbl(name: String, cols: Seq[Col], unique: Seq[String]) {
    def ints: Seq[Col]    = cols.filter(c => c.kind == "long" || c.kind == "int")
    def doubles: Seq[Col] = cols.filter(_.kind == "double")
    def strs: Seq[Col]    = cols.filter(_.kind == "string")
    def tss: Seq[Col]     = cols.filter(_.kind == "ts")
  }

  /** TESTDATA.md schemas (probed via pyarrow each round). documents.text is
    * deliberately excluded: multi-KB multilingual payloads add compare cost
    * without adding planner coverage (n_chars already carries its length). */
  val tables: Seq[Tbl] = Seq(
    Tbl("lineitem", Seq(
      Col("l_orderkey", "long"), Col("l_partkey", "long"), Col("l_suppkey", "long"),
      Col("l_linenumber", "int"), Col("l_quantity", "double"), Col("l_extendedprice", "double"),
      Col("l_discount", "double"), Col("l_tax", "double"), Col("l_returnflag", "string"),
      Col("l_linestatus", "string"), Col("l_shipdate", "ts")),
      Seq("l_orderkey", "l_linenumber")),
    Tbl("orders", Seq(
      Col("o_orderkey", "long"), Col("o_custkey", "long"), Col("o_orderstatus", "string"),
      Col("o_totalprice", "double"), Col("o_orderdate", "ts"), Col("o_orderpriority", "string")),
      Seq("o_orderkey")),
    Tbl("customer", Seq(
      Col("c_custkey", "long"), Col("c_name", "string"), Col("c_nationkey", "int"),
      Col("c_acctbal", "double"), Col("c_mktsegment", "string")),
      Seq("c_custkey")),
    Tbl("supplier", Seq(
      Col("s_suppkey", "long"), Col("s_name", "string"), Col("s_nationkey", "int"),
      Col("s_acctbal", "double")),
      Seq("s_suppkey")),
    Tbl("part", Seq(
      Col("p_partkey", "long"), Col("p_name", "string"), Col("p_brand", "string"),
      Col("p_type", "string"), Col("p_size", "int"), Col("p_retailprice", "double")),
      Seq("p_partkey")),
    Tbl("nation", Seq(
      Col("n_nationkey", "int"), Col("n_name", "string"), Col("n_regionkey", "int")),
      Seq("n_nationkey")),
    Tbl("region", Seq(Col("r_regionkey", "int"), Col("r_name", "string")),
      Seq("r_regionkey")),
    Tbl("events", Seq(
      Col("event_id", "long"), Col("ts", "ts"), Col("user_id", "long"),
      Col("event_type", "string"), Col("value", "double")),
      Seq("event_id")),
    Tbl("documents", Seq(
      Col("doc_id", "long"), Col("lang", "string"), Col("source", "string"),
      Col("n_chars", "long")),
      Seq("doc_id"))
  )

  /** TPC-H-shaped equi-join pairs (left table, right table, left key, right key). */
  val joins: Seq[(String, String, String, String)] = Seq(
    ("lineitem", "orders", "l_orderkey", "o_orderkey"),
    ("orders", "customer", "o_custkey", "c_custkey"),
    ("lineitem", "part", "l_partkey", "p_partkey"),
    ("lineitem", "supplier", "l_suppkey", "s_suppkey"),
    ("customer", "nation", "c_nationkey", "n_nationkey"),
    ("supplier", "nation", "s_nationkey", "n_nationkey"),
    ("nation", "region", "n_regionkey", "r_regionkey"))

  private def byName(n: String): Tbl = tables.find(_.name == n).get
  private def pick[A](r: Random, xs: Seq[A]): A = xs(r.nextInt(xs.length))

  /** Integer-typed expression over `t`'s columns (BIGINT or INT in both engines). */
  private def intExpr(r: Random, t: Tbl, depth: Int = 1): String = {
    val choices = Seq.newBuilder[() => String]
    if (t.ints.nonEmpty) {
      choices += (() => pick(r, t.ints).name)
      choices += (() => s"(${pick(r, t.ints).name} % ${2 + r.nextInt(12)})")
      choices += (() => s"(${pick(r, t.ints).name} + ${1 + r.nextInt(50)})")
    }
    if (t.doubles.nonEmpty)
      choices += (() => s"CAST(FLOOR(${pick(r, t.doubles).name}) AS BIGINT)")
    if (t.strs.nonEmpty)
      choices += (() => s"length(${pick(r, t.strs).name})")
    if (t.tss.nonEmpty)
      choices += (() => s"year(${pick(r, t.tss).name})")
    if (depth > 0)
      choices += (() =>
        s"(CASE WHEN ${pred(r, t, 0)} THEN ${intExpr(r, t, depth - 1)} ELSE ${intExpr(r, t, depth - 1)} END)")
    pick(r, choices.result())()
  }

  /** String-typed expression over `t`'s columns. */
  private def strExpr(r: Random, t: Tbl): String = {
    val c = pick(r, t.strs).name
    r.nextInt(3) match {
      case 0 => c
      case 1 => s"upper($c)"
      case _ => s"substr($c, 1, ${1 + r.nextInt(4)})"
    }
  }

  private val cmps = Seq("=", "<>", "<", "<=", ">", ">=")

  /** Boolean predicate over `t`'s columns; depth bounds AND/OR/NOT nesting. */
  private def pred(r: Random, t: Tbl, depth: Int = 2): String = {
    def atom: String = {
      val kinds = Seq.newBuilder[() => String]
      if (t.ints.nonEmpty || t.doubles.nonEmpty) {
        kinds += { () =>
          val k = 2 + r.nextInt(12)
          s"(${intExpr(r, t, 0)} % $k) ${pick(r, cmps)} ${r.nextInt(k)}"
        }
        kinds += { () =>
          val k = 4 + r.nextInt(10)
          val vals = (0 until (1 + r.nextInt(3))).map(_ => r.nextInt(k)).distinct
          s"(${intExpr(r, t, 0)} % $k) IN (${vals.mkString(", ")})"
        }
      }
      if (t.strs.nonEmpty) {
        kinds += (() => s"upper(${pick(r, t.strs).name}) LIKE '%${('A' + r.nextInt(26)).toChar}%'")
        kinds += { () =>
          val lo = ('a' + r.nextInt(13)).toChar
          s"substr(lower(${pick(r, t.strs).name}), 1, 1) BETWEEN '$lo' AND '${(lo + 1 + r.nextInt(12)).toChar}'"
        }
        kinds += (() => s"${pick(r, t.strs).name} IS NOT NULL")
      }
      pick(r, kinds.result())()
    }
    if (depth <= 0 || r.nextInt(3) == 0) atom
    else r.nextInt(3) match {
      case 0 => s"(${pred(r, t, depth - 1)} AND ${pred(r, t, depth - 1)})"
      case 1 => s"(${pred(r, t, depth - 1)} OR ${pred(r, t, depth - 1)})"
      case _ => s"(NOT ${pred(r, t, depth - 1)})"
    }
  }

  /** One aggregate with alias `c$i`; int/string payload only, SUM cast to
    * BIGINT. FILTER (WHERE ...) is the post-SQL:2003 form both engines
    * support — a distinct evaluation path from CASE-WHEN-sum. */
  private def aggExpr(r: Random, t: Tbl, i: Int): String = r.nextInt(8) match {
    case 0 => s"COUNT(*) AS c$i"
    case 1 => s"CAST(SUM(${intExpr(r, t, 0)}) AS BIGINT) AS c$i"
    case 2 => s"${pick(r, Seq("MIN", "MAX"))}(${intExpr(r, t, 0)}) AS c$i"
    case 3 if t.strs.nonEmpty => s"${pick(r, Seq("MIN", "MAX"))}(${strExpr(r, t)}) AS c$i"
    case 4 => s"COUNT(DISTINCT ${intExpr(r, t, 0)}) AS c$i"
    case 5 => s"COUNT(*) FILTER (WHERE ${pred(r, t, 1)}) AS c$i"
    case 6 => s"CAST(SUM(${intExpr(r, t, 0)}) FILTER (WHERE ${pred(r, t, 1)}) AS BIGINT) AS c$i"
    case _ => s"CAST(SUM(CASE WHEN ${pred(r, t, 1)} THEN 1 ELSE 0 END) AS BIGINT) AS c$i"
  }

  /** Any-typed projection expression (int- or string-typed). */
  private def projExpr(r: Random, t: Tbl): String =
    if (t.strs.nonEmpty && r.nextInt(3) == 0) strExpr(r, t) else intExpr(r, t)

  /** ORDER BY over output aliases c0..c{n-1}: full column list, explicit
    * direction AND null placement on every key (engine defaults differ). */
  private def orderByAll(r: Random, n: Int): String =
    (0 until n).map { i =>
      val dir = if (r.nextBoolean()) "ASC" else "DESC"
      val nul = if (r.nextBoolean()) "NULLS FIRST" else "NULLS LAST"
      s"c$i $dir $nul"
    }.mkString("ORDER BY ", ", ", "")

  // ---- plan kinds -------------------------------------------------------

  private def filterProject(r: Random, t: Tbl): String = {
    val n = 2 + r.nextInt(3)
    val proj = (0 until n).map(i => s"${projExpr(r, t)} AS c$i").mkString(", ")
    val distinct = if (r.nextInt(4) == 0) "DISTINCT " else ""
    s"SELECT $distinct$proj FROM ${t.name} WHERE ${pred(r, t)} " +
      s"${orderByAll(r, n)} LIMIT ${200 + r.nextInt(1800)}"
  }

  private def groupAgg(r: Random, t: Tbl): String = {
    val ng = 1 + r.nextInt(2)
    val keys = (0 until ng).map { i =>
      val e = if (t.strs.nonEmpty && r.nextInt(2) == 0) strExpr(r, t)
              else s"(${intExpr(r, t, 0)} % ${2 + r.nextInt(20)})"
      s"$e AS c$i"
    }
    val na = 1 + r.nextInt(3)
    val aggs = (0 until na).map(i => aggExpr(r, t, ng + i))
    val having = if (r.nextInt(3) == 0) s" HAVING COUNT(*) > ${r.nextInt(5)}" else ""
    s"SELECT ${(keys ++ aggs).mkString(", ")} FROM ${t.name} WHERE ${pred(r, t)} " +
      s"GROUP BY ${(1 to ng).mkString(", ")}$having"
  }

  private def joinAgg(r: Random): String = {
    val (ln, rn, lk, rk) = pick(r, joins)
    val (lt, rt) = (byName(ln), byName(rn))
    val left = r.nextBoolean()
    // LEFT JOIN keeps its right-side predicate in the ON clause so the
    // left-preserving semantics are actually exercised (a WHERE on the
    // right side would collapse it back to inner in both engines)
    val (joinSql, whereSql) =
      if (left)
        (s"$ln LEFT JOIN $rn ON $lk = $rk AND ${pred(r, rt, 1)}", s"WHERE ${pred(r, lt, 1)}")
      else
        (s"$ln JOIN $rn ON $lk = $rk", s"WHERE (${pred(r, lt, 1)} AND ${pred(r, rt, 1)})")
    if (r.nextInt(3) == 0) {
      // no-agg join: project both sides, full-order + limit
      val n = 2 + r.nextInt(2)
      val proj = (0 until n).map { i =>
        val side = if (r.nextBoolean()) lt else rt
        s"${projExpr(r, side)} AS c$i"
      }
      s"SELECT ${proj.mkString(", ")} FROM $joinSql $whereSql " +
        s"${orderByAll(r, n)} LIMIT ${200 + r.nextInt(1800)}"
    } else {
      val key = if (r.nextBoolean() && rt.strs.nonEmpty) strExpr(r, rt)
                else s"(${intExpr(r, lt, 0)} % ${2 + r.nextInt(15)})"
      // aggregate over the RIGHT side under LEFT join: COUNT(col) vs
      // COUNT(*) over null-extended rows is exactly the classic bug site
      val na = 1 + r.nextInt(2)
      val aggs = (0 until na).map { i =>
        if (left && r.nextInt(2) == 0) s"COUNT(${pick(r, rt.ints).name}) AS c${1 + i}"
        else aggExpr(r, if (r.nextBoolean()) lt else rt, 1 + i)
      }
      s"SELECT $key AS c0, ${aggs.mkString(", ")} FROM $joinSql $whereSql GROUP BY 1"
    }
  }

  private def windowQ(r: Random, t: Tbl): String = {
    val uniq = t.unique
    val uCols = uniq.zipWithIndex.map { case (u, i) => s"$u AS c$i" }
    val nu = uniq.length
    val partKey = s"(${intExpr(r, t, 0)} % ${2 + r.nextInt(10)})"
    val ord = uniq.map(u => s"$u ASC NULLS FIRST").mkString(", ")
    // Sequence-sensitive payloads (LAG, running SUM) must be functions of
    // the ORDER BY keys: the synthetic testdata does NOT make the declared
    // key unique (sf0.01 lineitem: 60000 rows, 45832 distinct
    // (l_orderkey, l_linenumber) pairs — the harness's first catch, seed
    // 14141414 plan 0037), so tied rows must carry equal payload values for
    // the plan to be tie-permutation-invariant in both engines.
    def ordExpr: String = s"(${pick(r, uniq)} % ${2 + r.nextInt(10)})"
    val wfn = r.nextInt(4) match {
      case 0 => s"ROW_NUMBER() OVER (PARTITION BY $partKey ORDER BY $ord)"
      // rank/dense_rank order by a possibly-tied expression: per-row rank
      // over a multiset is deterministic even under ties
      case 1 => s"RANK() OVER (PARTITION BY $partKey ORDER BY (${intExpr(r, t, 0)} % 7) ASC NULLS FIRST, $ord)"
      case 2 => s"CAST(SUM($ordExpr) OVER (PARTITION BY $partKey ORDER BY $ord ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)"
      case _ => s"LAG($ordExpr, 1) OVER (PARTITION BY $partKey ORDER BY $ord)"
    }
    val inner = s"SELECT ${uCols.mkString(", ")}, $partKey AS c$nu, $wfn AS w " +
      s"FROM ${t.name} WHERE ${pred(r, t, 1)}"
    if (r.nextBoolean() && wfn.startsWith("ROW_NUMBER"))
      s"SELECT * FROM ($inner) x WHERE w <= ${1 + r.nextInt(5)}"
    else inner
  }

  private def setOp(r: Random, t: Tbl): String = {
    val n = 2
    val exprs = (0 until n).map(_ => projExpr(r, t))
    def branch(p: String) =
      s"SELECT ${exprs.zipWithIndex.map { case (e, i) => s"$e AS c$i" }.mkString(", ")} FROM ${t.name} WHERE $p"
    val op = pick(r, Seq("UNION ALL", "INTERSECT", "EXCEPT"))
    val body = s"${branch(pred(r, t, 1))} $op ${branch(pred(r, t, 1))}"
    if (r.nextBoolean())
      s"SELECT c0, c1, COUNT(*) AS c2 FROM ($body) u GROUP BY 1, 2"
    else
      s"SELECT * FROM ($body) u ${orderByAll(r, n)} LIMIT ${200 + r.nextInt(1800)}"
  }

  /** Post-agg filter over a derived group-agg table (projection pushdown
    * through an aggregate + HAVING-equivalent predicate placement). The
    * inner's c1 is pinned to COUNT(*) so the outer modulo filter is always
    * integer-typed (a string c1 would be an ANSI cast error in Spark but a
    * best-effort cast in DuckDB — a generator bug, not an engine diff). */
  private def nested(r: Random, t: Tbl): String = {
    val key = if (t.strs.nonEmpty && r.nextInt(2) == 0) strExpr(r, t)
              else s"(${intExpr(r, t, 0)} % ${2 + r.nextInt(20)})"
    val extra = if (r.nextBoolean()) s", ${aggExpr(r, t, 2)}" else ""
    val innerSql = s"SELECT $key AS c0, COUNT(*) AS c1$extra " +
      s"FROM ${t.name} WHERE ${pred(r, t, 1)} GROUP BY 1"
    val k = 2 + r.nextInt(8)
    s"SELECT * FROM ($innerSql) g WHERE (c1 % $k) ${pick(r, cmps)} ${r.nextInt(k)}"
  }

  /** IN / NOT IN / EXISTS / NOT EXISTS subquery over a join pair — the
    * semi/anti-join and subquery-decorrelation planner paths, which none of
    * the other kinds reach. Keys are non-null by construction, so NOT IN's
    * three-valued-logic trap (any NULL in the subquery → empty result,
    * identically in both engines) can't make plans vacuously empty. */
  private def semiAnti(r: Random): String = {
    val (ln, rn, lk, rk) = pick(r, joins)
    val (lt, rt) = (byName(ln), byName(rn))
    val sub = s"SELECT $rk FROM $rn WHERE ${pred(r, rt, 1)}"
    val where = r.nextInt(4) match {
      case 0 => s"$lk IN ($sub)"
      case 1 => s"$lk NOT IN ($sub)"
      case 2 => s"EXISTS (SELECT 1 FROM $rn WHERE $rk = $lk AND ${pred(r, rt, 1)})"
      case _ => s"NOT EXISTS (SELECT 1 FROM $rn WHERE $rk = $lk AND ${pred(r, rt, 1)})"
    }
    val ng = 1 + r.nextInt(2)
    val keys = (0 until ng).map(i => s"(${intExpr(r, lt, 0)} % ${2 + r.nextInt(15)}) AS c$i")
    val aggs = (0 until (1 + r.nextInt(2))).map(i => aggExpr(r, lt, ng + i))
    s"SELECT ${(keys ++ aggs).mkString(", ")} FROM $ln " +
      s"WHERE ($where AND ${pred(r, lt, 1)}) GROUP BY ${(1 to ng).mkString(", ")}"
  }

  /** CTE feeding a join back against its base table (tests that pushdown
    * and reuse through a WITH block agree across engines). */
  private def cteQ(r: Random): String = {
    val (ln, rn, lk, rk) = pick(r, joins)
    val (lt, rt) = (byName(ln), byName(rn))
    val cte = s"SELECT $rk AS k, COUNT(*) AS n FROM $rn WHERE ${pred(r, rt, 1)} GROUP BY 1"
    val key = s"(${intExpr(r, lt, 0)} % ${2 + r.nextInt(12)})"
    s"WITH dim AS ($cte) SELECT $key AS c0, CAST(SUM(n) AS BIGINT) AS c1, " +
      s"COUNT(*) AS c2 FROM $ln JOIN dim ON $lk = dim.k " +
      s"WHERE ${pred(r, lt, 1)} GROUP BY 1"
  }

  /** ROLLUP/CUBE over two string keys, GROUPING() markers included so a
    * genuine NULL key and a rolled-up level are distinguishable in the
    * payload. String keys keep the null-group rows in object dtype (both
    * engines' results flow through the same pandas read, so int-with-null
    * float widening would also agree — strings just avoid the question). */
  private def rollupQ(r: Random, t: Tbl): String = {
    val (e0, e1) = (strExpr(r, t), strExpr(r, t))
    val op = if (r.nextBoolean()) "ROLLUP" else "CUBE"
    val aggs = (0 until (1 + r.nextInt(2))).map(i => aggExpr(r, t, 2 + i))
    // HAVING COUNT(*) > 0 masks a GENUINE engine divergence the harness
    // caught (3 plans, seed 20260815 @ sf0.001): over an EMPTY input, the
    // standard's `()` grouping set emits one grand-total row (DuckDB and
    // PostgreSQL: (NULL, 0)), while Spark emits nothing. Every real
    // grouping-set row has COUNT(*) >= 1, so the guard filters ONLY the
    // empty-input phantom row and keeps full rollup/cube coverage.
    // Pinned as a documented difference in FuzzDifferentialSpec.
    s"SELECT $e0 AS c0, $e1 AS c1, GROUPING($e0) AS g0, GROUPING($e1) AS g1, " +
      s"${aggs.mkString(", ")} FROM ${t.name} WHERE ${pred(r, t, 1)} " +
      s"GROUP BY $op($e0, $e1) HAVING COUNT(*) > 0"
  }

  /** FULL OUTER equi-join with per-side filters INSIDE derived tables (a
    * WHERE above the join would silently collapse the outer sides), keyed
    * aggregation over the coalesced key. COUNT(side key) vs COUNT(*) is
    * the null-extension-sensitive payload. */
  private def fullJoin(r: Random): String = {
    val (ln, rn, lk, rk) = pick(r, joins)
    val (lt, rt) = (byName(ln), byName(rn))
    s"SELECT COALESCE($lk, $rk) % ${2 + r.nextInt(15)} AS c0, " +
      s"COUNT($lk) AS c1, COUNT($rk) AS c2, COUNT(*) AS c3 " +
      s"FROM (SELECT * FROM $ln WHERE ${pred(r, lt, 1)}) a " +
      s"FULL JOIN (SELECT * FROM $rn WHERE ${pred(r, rt, 1)}) b ON $lk = $rk " +
      s"GROUP BY 1"
  }

  /** Three-table chain joins — the join-reorder planner surface none of
    * the two-table kinds reach (Catalyst's CostBasedJoinReorder and
    * DuckDB's DP reorderer must produce the same RESULT whatever order
    * they pick). */
  private val chains: Seq[(String, String, String, String, String, String, String)] = Seq(
    ("lineitem", "orders", "customer", "l_orderkey", "o_orderkey", "o_custkey", "c_custkey"),
    ("lineitem", "supplier", "nation", "l_suppkey", "s_suppkey", "s_nationkey", "n_nationkey"),
    ("customer", "nation", "region", "c_nationkey", "n_nationkey", "n_regionkey", "r_regionkey"))

  private def chainJoin(r: Random): String = {
    val (an, bn, cn, ak, bk, bk2, ck) = pick(r, chains)
    val (at, bt, ct) = (byName(an), byName(bn), byName(cn))
    val key = r.nextInt(3) match {
      case 0 => s"(${intExpr(r, at, 0)} % ${2 + r.nextInt(12)})"
      case 1 if ct.strs.nonEmpty => strExpr(r, ct)
      case _ => s"(${intExpr(r, bt, 0)} % ${2 + r.nextInt(12)})"
    }
    val aggs = (0 until (1 + r.nextInt(2))).map(i => aggExpr(r, pick(r, Seq(at, bt, ct)), 1 + i))
    s"SELECT $key AS c0, ${aggs.mkString(", ")} FROM $an " +
      s"JOIN $bn ON $ak = $bk JOIN $cn ON $bk2 = $ck " +
      s"WHERE (${pred(r, at, 1)} AND ${pred(r, ct, 1)}) GROUP BY 1"
  }

  /** Null-semantics kind: a derived table that INJECTS NULLs on a modulo
    * of the unique key (the base testdata is nearly null-free, so nothing
    * else exercises null group keys, COUNT(col) vs COUNT(*), SUM over
    * all-null groups, or nulls dropped by an equi-join). Kept away from
    * NOT IN (three-valued logic would empty results identically but
    * vacuously). */
  private def nullInjected(r: Random, t: Tbl): String = {
    val uk = t.unique.head
    val (k1, k2) = (3 + r.nextInt(8), 3 + r.nextInt(8))
    val x = s"CASE WHEN $uk % $k1 = 0 THEN NULL ELSE ${intExpr(r, t, 0)} END"
    val g = if (t.strs.nonEmpty)
      s"CASE WHEN $uk % $k2 = 1 THEN NULL ELSE ${strExpr(r, t)} END"
    else s"CASE WHEN $uk % $k2 = 1 THEN NULL ELSE (${intExpr(r, t, 0)} % 5) END"
    val inner = s"SELECT $x AS x, $g AS g FROM ${t.name} WHERE ${pred(r, t, 1)}"
    r.nextInt(3) match {
      case 0 =>
        // null group key + the COUNT family over a nullable column
        s"SELECT g AS c0, COUNT(*) AS c1, COUNT(x) AS c2, " +
          s"CAST(SUM(x) AS BIGINT) AS c3, COUNT(DISTINCT x) AS c4 " +
          s"FROM ($inner) n GROUP BY 1"
      case 1 =>
        // nulls never match an equi-join key: self-join on the nullable
        // column must drop every injected row in both engines. The join
        // key is UNIQUE-key-derived (not a low-cardinality expression) so
        // the self-join stays ~n rows instead of exploding quadratically
        // at sf0.1.
        val ji = s"SELECT CASE WHEN $uk % $k1 = 0 THEN NULL ELSE $uk END AS x, $g AS g FROM ${t.name} WHERE ${pred(r, t, 1)}"
        s"SELECT a.g AS c0, COUNT(*) AS c1, COUNT(b.x) AS c2 FROM ($ji) a " +
          s"JOIN ($ji) b ON a.x = b.x GROUP BY 1"
      case _ =>
        // IS DISTINCT FROM: the null-safe comparison path
        s"SELECT COUNT(*) AS c0, " +
          s"COUNT(*) FILTER (WHERE x IS DISTINCT FROM ${r.nextInt(20)}) AS c1, " +
          s"COUNT(*) FILTER (WHERE g IS NULL) AS c2 FROM ($inner) n"
    }
  }

  /** RIGHT OUTER equi-join (round-14 verdict #3: RIGHT was unfuzzed — it is
    * not just LEFT mirrored in the planner; Catalyst normalizes RIGHT to
    * LEFT by swapping children, and THAT rewrite is the path under test).
    * The left-side predicate lives in the ON clause so right-preserving
    * semantics are exercised; COUNT(left key) vs COUNT(*) is the
    * null-extension-sensitive payload. */
  private def rightJoin(r: Random): String = {
    val (ln, rn, lk, rk) = pick(r, joins)
    val (lt, rt) = (byName(ln), byName(rn))
    val key = if (rt.strs.nonEmpty && r.nextBoolean()) strExpr(r, rt)
              else s"(${intExpr(r, rt, 0)} % ${2 + r.nextInt(15)})"
    val extra = if (r.nextBoolean()) s", ${aggExpr(r, rt, 3)}" else ""
    s"SELECT $key AS c0, COUNT($lk) AS c1, COUNT(*) AS c2$extra " +
      s"FROM $ln RIGHT JOIN $rn ON $lk = $rk AND ${pred(r, lt, 1)} " +
      s"WHERE ${pred(r, rt, 1)} GROUP BY 1"
  }

  /** Explicit GROUPING SETS — incomparable set combinations ROLLUP/CUBE
    * cannot express (e.g. {(a),(b)} with neither a superset of the other),
    * a distinct Expand-planning path in Spark. GROUPING() markers
    * disambiguate genuine NULL keys from rolled-up levels; the
    * HAVING COUNT(*) > 0 guard masks the same empty-input `()` phantom-row
    * divergence rollupQ documents (pinned in FuzzDifferentialSpec). */
  private def groupingSetsQ(r: Random, t: Tbl): String = {
    val (e0, e1) = (strExpr(r, t), s"(${intExpr(r, t, 0)} % ${2 + r.nextInt(10)})")
    val sets = pick(r, Seq(
      s"(($e0, $e1), ($e0), ())",
      s"(($e0, $e1), ($e1))",
      s"(($e0), ($e1))",
      s"(($e0), ($e1), ())"))
    val aggs = (0 until (1 + r.nextInt(2))).map(i => aggExpr(r, t, 2 + i))
    s"SELECT $e0 AS c0, $e1 AS c1, GROUPING($e0) AS g0, GROUPING($e1) AS g1, " +
      s"${aggs.mkString(", ")} FROM ${t.name} WHERE ${pred(r, t, 1)} " +
      s"GROUP BY GROUPING SETS $sets HAVING COUNT(*) > 0"
  }

  /** RANGE window frames over a single integer order key — a peers-based
    * frame (every row with the same key value shares one frame), so the
    * result is a pure function of the key value and the plan is
    * tie-permutation-invariant BY SEMANTICS, not by payload construction
    * (unlike the ROWS frames in windowQ, which need order-key-functional
    * payloads). Both the unbounded-preceding running form and the
    * k-PRECEDING sliding form are distinct evaluation paths from ROWS. */
  private def rangeWindowQ(r: Random, t: Tbl): String = {
    val uCols = t.unique.zipWithIndex.map { case (u, i) => s"$u AS c$i" }
    val nu = t.unique.length
    val partKey = s"(${intExpr(r, t, 0)} % ${2 + r.nextInt(8)})"
    val ordKey = s"(${intExpr(r, t, 0)} % ${5 + r.nextInt(40)})"
    val payload = s"(${pick(r, t.ints.map(_.name))} % ${2 + r.nextInt(10)})"
    val frame = r.nextInt(3) match {
      case 0 => "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
      case 1 => s"RANGE BETWEEN ${1 + r.nextInt(10)} PRECEDING AND CURRENT ROW"
      case _ => s"RANGE BETWEEN ${1 + r.nextInt(5)} PRECEDING AND ${1 + r.nextInt(5)} FOLLOWING"
    }
    val fn = pick(r, Seq("SUM", "COUNT", "MIN", "MAX"))
    // explicit NULLS placement on the window order key (engine defaults
    // differ); the frame key is modulo-of-int so NULLs are only possible
    // via a rare null base value — placement pins them to one peer group.
    // partKey/ordKey/payload are ALL computed and aliased INSIDE the
    // derived table (p/k/v) — an outer reference to a base column the
    // inner didn't project is an unresolved-column generator bug (caught
    // by this kind's first smoke run: length(p_name) in the outer window).
    val w = s"CAST($fn(v) OVER (PARTITION BY p ORDER BY k ASC NULLS FIRST $frame) AS BIGINT)"
    s"SELECT ${uCols.mkString(", ")}, k AS c$nu, $w AS w FROM " +
      s"(SELECT ${t.unique.mkString(", ")}, $partKey AS p, $ordKey AS k, $payload AS v " +
      s"FROM ${t.name} WHERE ${pred(r, t, 1)}) b"
  }

  /** Correlated SCALAR subqueries — the decorrelation rewrite
    * (RewriteCorrelatedScalarSubquery) that the curated set probes exactly
    * once. COUNT(*) is the never-NULL scalar, so the WHERE form can't go
    * vacuously three-valued. Three placements: projected then aggregated
    * over (decorrelate-under-agg), filtering in WHERE, and per-row
    * projection alongside the outer unique key. */
  private def correlatedScalar(r: Random): String = {
    val (ln, rn, lk, rk) = pick(r, joins)
    val (lt, rt) = (byName(ln), byName(rn))
    val sub = s"(SELECT COUNT(*) FROM $rn WHERE $rk = $lk AND ${pred(r, rt, 1)})"
    r.nextInt(3) match {
      case 0 =>
        val key = s"(${intExpr(r, lt, 0)} % ${2 + r.nextInt(12)})"
        s"SELECT c0, CAST(SUM(s) AS BIGINT) AS c1, COUNT(*) AS c2 FROM " +
          s"(SELECT $key AS c0, $sub AS s FROM $ln WHERE ${pred(r, lt, 1)}) x GROUP BY 1"
      case 1 =>
        val keys = (0 until 2).map(i => s"(${intExpr(r, lt, 0)} % ${2 + r.nextInt(12)}) AS c$i")
        s"SELECT ${keys.mkString(", ")}, ${aggExpr(r, lt, 2)} FROM $ln " +
          s"WHERE ($sub ${pick(r, cmps)} ${r.nextInt(4)} AND ${pred(r, lt, 1)}) GROUP BY 1, 2"
      case _ =>
        val uCols = lt.unique.zipWithIndex.map { case (u, i) => s"$u AS c$i" }
        s"SELECT ${uCols.mkString(", ")}, $sub AS s FROM $ln WHERE ${pred(r, lt, 1)}"
    }
  }

  /** Deep scalar expression trees in the payload — nested CASE over string
    * compositions (concat/replace/trim/reverse) and integer compositions
    * (abs/greatest/least), the constant-folding / codegen expression
    * surface the flat payloads of the other kinds never stress. Every
    * function used is semantics-identical in Spark and DuckDB over ASCII
    * inputs; substr keeps arguments in-range by construction. */
  private def strExprDeep(r: Random, t: Tbl, depth: Int): String = {
    val base = strExpr(r, t)
    if (depth <= 0) base
    else r.nextInt(5) match {
      case 0 => s"concat(${strExprDeep(r, t, depth - 1)}, '_', ${strExprDeep(r, t, depth - 1)})"
      case 1 => s"replace(${strExprDeep(r, t, depth - 1)}, '${('a' + r.nextInt(26)).toChar}', '${('A' + r.nextInt(26)).toChar}')"
      case 2 => s"reverse(${strExprDeep(r, t, depth - 1)})"
      case 3 => s"trim(${strExprDeep(r, t, depth - 1)})"
      case _ => s"(CASE WHEN ${pred(r, t, 0)} THEN ${strExprDeep(r, t, depth - 1)} ELSE ${strExprDeep(r, t, depth - 1)} END)"
    }
  }

  private def intExprDeep(r: Random, t: Tbl, depth: Int): String = {
    if (depth <= 0) intExpr(r, t, 0)
    else r.nextInt(4) match {
      case 0 => s"abs(${intExprDeep(r, t, depth - 1)} - ${r.nextInt(100)})"
      case 1 => s"greatest(${intExprDeep(r, t, depth - 1)}, ${intExprDeep(r, t, depth - 1)})"
      case 2 => s"least(${intExprDeep(r, t, depth - 1)}, ${intExprDeep(r, t, depth - 1)})"
      case _ => s"length(${strExprDeep(r, t, depth - 1)})"
    }
  }

  private def exprTree(r: Random, t: Tbl): String = {
    val n = 2 + r.nextInt(2)
    val proj = (0 until n).map { i =>
      val e = if (r.nextBoolean()) strExprDeep(r, t, 2) else intExprDeep(r, t, 2)
      s"$e AS c$i"
    }
    s"SELECT ${proj.mkString(", ")} FROM ${t.name} WHERE ${pred(r, t)} " +
      s"${orderByAll(r, n)} LIMIT ${200 + r.nextInt(1800)}"
  }

  /** Non-equi / theta joins — the one planner path the round-14 verdict
    * still listed as unfuzzed. Three distinct physical shapes:
    * (0) PURE inequality join between two GROUP-BY-bounded derived tables
    *     (no equi conjunct anywhere → BroadcastNestedLoopJoin planning and
    *     its condition evaluation); the derived tables are ≤ ~16 rows each
    *     by modulo construction, so the quadratic worst case is ≤ ~256
    *     output rows at any SF;
    * (1) BETWEEN band join over the same bounded shape (the range-predicate
    *     rewrite of the BNLJ condition — both bounds in one conjunct);
    * (2) equi-join with a non-equi RESIDUAL in the ON clause (hash/SMJ with
    *     an extra join-condition filter — a different evaluation site from
    *     a WHERE on the joined result, and the classic place for an
    *     outer-join-aware planner to mis-push a predicate);
    * (3) correlated non-equi EXISTS (left-semi BNLJ after decorrelation —
    *     RewritePredicateSubquery with an inequality correlation, which
    *     the equi-correlated semiAnti kind never reaches).
    * Payloads are COUNT(*)-modulo (always ≥ 0, exact in both engines);
    * NULL inequality comparisons drop rows identically in both engines. */
  private def nonEquiJoin(r: Random): String = {
    // a bounded derived table: ≤ ka groups, value = COUNT(*) % m
    def tiny(t: Tbl, alias: String): String = {
      val ka = 3 + r.nextInt(14)
      val m = 4 + r.nextInt(20)
      s"(SELECT (${intExpr(r, t, 0)} % $ka) AS g, (COUNT(*) % $m) AS v " +
        s"FROM ${t.name} WHERE ${pred(r, t, 1)} GROUP BY 1) $alias"
    }
    r.nextInt(4) match {
      case 0 =>
        val (t1, t2) = (pick(r, tables), pick(r, tables))
        val op = pick(r, Seq("<", "<=", ">", ">=", "<>"))
        s"SELECT a.g AS c0, b.g AS c1, a.v AS c2, b.v AS c3 " +
          s"FROM ${tiny(t1, "a")} JOIN ${tiny(t2, "b")} ON a.v $op b.v " +
          s"${orderByAll(r, 4)}"
      case 1 =>
        val (t1, t2) = (pick(r, tables), pick(r, tables))
        val (d1, d2) = (r.nextInt(4), r.nextInt(4))
        s"SELECT a.g AS c0, b.g AS c1, a.v AS c2, b.v AS c3 " +
          s"FROM ${tiny(t1, "a")} JOIN ${tiny(t2, "b")} " +
          s"ON a.v BETWEEN b.v - $d1 AND b.v + $d2 " +
          s"${orderByAll(r, 4)}"
      case 2 =>
        val (ln, rn, lk, rk) = pick(r, joins)
        val (lt, rt) = (byName(ln), byName(rn))
        val (ma, mb) = (2 + r.nextInt(10), 2 + r.nextInt(10))
        val op = pick(r, Seq("<", "<=", ">", ">="))
        val key = s"(${intExpr(r, lt, 0)} % ${2 + r.nextInt(12)})"
        s"SELECT $key AS c0, COUNT(*) AS c1, ${aggExpr(r, rt, 2)} " +
          s"FROM $ln JOIN $rn ON $lk = $rk " +
          s"AND (${intExpr(r, lt, 0)} % $ma) $op (${intExpr(r, rt, 0)} % $mb) " +
          s"WHERE ${pred(r, lt, 1)} GROUP BY 1"
      case _ =>
        val (ln, rn, lk, rk) = pick(r, joins)
        val (lt, rt) = (byName(ln), byName(rn))
        val (ma, mb) = (2 + r.nextInt(8), 2 + r.nextInt(8))
        val op = pick(r, Seq("<", ">"))
        val neg = if (r.nextBoolean()) "" else "NOT "
        val key = s"(${intExpr(r, lt, 0)} % ${2 + r.nextInt(12)})"
        s"SELECT $key AS c0, ${aggExpr(r, lt, 1)} FROM $ln WHERE $neg" +
          s"EXISTS (SELECT 1 FROM $rn WHERE $rk = $lk " +
          s"AND ($rk % $mb) $op (${intExpr(r, lt, 0)} % $ma)) " +
          s"AND ${pred(r, lt, 1)} GROUP BY 1"
    }
  }

  /** Correlated LATERAL subqueries in FROM (round-17 stretch #8: the
    * lateral-join planner path — Spark plans these as LateralJoin +
    * DecorrelateInnerQuery, DuckDB through its own dependent-join
    * unnesting — which no other kind reaches; the curated set touches
    * lateral correlation exactly once). Comma-form `FROM t, LATERAL (...)`
    * is the syntax both engines accept. Two shapes:
    * (0) scalar-agg lateral — the lateral body aggregates the correlated
    *     right rows, so it yields EXACTLY one row per left row (COUNT over
    *     an empty match set is still one row of 0: no left row is dropped,
    *     which makes a mis-decorrelation that drops or duplicates left
    *     rows directly visible in c2);
    * (1) multi-row lateral — the body emits every correlated right row's
    *     modulo-projected value (inner-join multiplicity: left rows with
    *     no matches vanish), re-aggregated on the outside so result sizes
    *     stay bounded at any SF. */
  private def lateralQ(r: Random): String = {
    val (ln, rn, lk, rk) = pick(r, joins)
    val (lt, rt) = (byName(ln), byName(rn))
    val key = s"(${intExpr(r, lt, 0)} % ${2 + r.nextInt(12)})"
    r.nextInt(2) match {
      case 0 =>
        s"SELECT $key AS c0, CAST(SUM(l.cnt) AS BIGINT) AS c1, COUNT(*) AS c2 " +
          s"FROM $ln, LATERAL (SELECT COUNT(*) AS cnt FROM $rn " +
          s"WHERE $rk = $lk AND ${pred(r, rt, 1)}) l " +
          s"WHERE ${pred(r, lt, 1)} GROUP BY 1"
      case _ =>
        val m = 2 + r.nextInt(10)
        s"SELECT $key AS c0, COUNT(*) AS c1, CAST(SUM(l.v) AS BIGINT) AS c2 " +
          s"FROM $ln, LATERAL (SELECT (${intExpr(r, rt, 0)} % $m) AS v FROM $rn " +
          s"WHERE $rk = $lk AND ${pred(r, rt, 1)}) l " +
          s"WHERE ${pred(r, lt, 1)} GROUP BY 1"
    }
  }

  /** Windowed filtering — the QUALIFY pattern spelled portably (derived
    * table computing analytic columns, filtered by the OUTER where; Spark
    * has no QUALIFY keyword, so this is the form users actually write).
    * windowQ pins exactly one such shape (row_number ≤ k); this kind
    * generalizes to rank/dense_rank cutoffs, modulo predicates over a
    * running sum, and conjunctions over TWO window columns. Both windows
    * share ONE (partition, order) spec: the per-row (w1, w2) pairing is
    * then a pure function of the position in that shared order, so rows
    * tied on the order keys (the declared unique keys are NOT unique in
    * the synthetic data — windowQ's documented catch) carry identical
    * output whichever engine-specific tie order materializes. The filter
    * sits ABOVE the window — the placement a pushdown bug would corrupt by
    * filtering before rank assignment. */
  private def qualifyQ(r: Random, t: Tbl): String = {
    val uniq = t.unique
    val uCols = uniq.zipWithIndex.map { case (u, i) => s"$u AS c$i" }
    val ord = uniq.map(u => s"$u ASC NULLS FIRST").mkString(", ")
    val p1 = s"(${intExpr(r, t, 0)} % ${2 + r.nextInt(8)})"
    def ordExpr: String = s"(${pick(r, uniq)} % ${2 + r.nextInt(10)})"
    // ONE full ORDER BY shared verbatim by BOTH windows — the rank variants
    // prepend their tie-prone expression to the SHARED spec rather than
    // keeping it private (the kind's first smoke run caught the
    // alternative: w1 carried an extra leading order key w2 lacked, so rows
    // tied on the declared-unique keys — which are NOT unique in the data —
    // paired (w1, w2) differently across engines; seed 17004 plan 0185,
    // 164 mismatched rows). With the shared spec, rows tied on EVERY key
    // carry equal rank and equal-multiset running sums, so output is
    // tie-permutation-invariant.
    val (w1fn, fullOrd) = r.nextInt(3) match {
      case 0 => ("ROW_NUMBER()", ord)
      case 1 => ("RANK()", s"(${intExpr(r, t, 0)} % 7) ASC NULLS FIRST, $ord")
      case _ => ("DENSE_RANK()", s"(${intExpr(r, t, 0)} % 5) ASC NULLS FIRST, $ord")
    }
    val w1 = s"$w1fn OVER (PARTITION BY $p1 ORDER BY $fullOrd)"
    val w2 = s"CAST(SUM($ordExpr) OVER (PARTITION BY $p1 ORDER BY $fullOrd " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)"
    val inner = s"SELECT ${uCols.mkString(", ")}, $w1 AS w1, $w2 AS w2 " +
      s"FROM ${t.name} WHERE ${pred(r, t, 1)}"
    val filter = r.nextInt(3) match {
      case 0 => s"w1 <= ${1 + r.nextInt(5)}"
      case 1 => s"(w2 % ${2 + r.nextInt(6)}) = ${r.nextInt(2)}"
      case _ => s"(w1 <= ${2 + r.nextInt(4)} AND (w2 % ${2 + r.nextInt(5)}) <> 0)"
    }
    s"SELECT * FROM ($inner) q WHERE $filter"
  }

  /** Deterministic (seed, index) → (name, SQL). */
  def plan(seed: Long, i: Int): (String, String) = {
    val r = new Random(seed + 1000003L * i)
    val t = pick(r, tables)
    val sql = r.nextInt(48) match {
      case x if x < 4  => filterProject(r, t)
      case x if x < 9  => groupAgg(r, t)
      case x if x < 13 => joinAgg(r)
      case x if x < 16 => windowQ(r, t)
      case x if x < 18 => setOp(r, t)
      case x if x < 20 => nested(r, t)
      case x if x < 22 => semiAnti(r)
      case x if x < 24 => cteQ(r)
      case x if x < 26 => rollupQ(r, t)
      case x if x < 28 => fullJoin(r)
      case x if x < 30 => chainJoin(r)
      case x if x < 32 => nullInjected(r, t)
      case x if x < 34 => rightJoin(r)
      case x if x < 36 => groupingSetsQ(r, t)
      case x if x < 38 => rangeWindowQ(r, t)
      case x if x < 40 => correlatedScalar(r)
      case x if x < 42 => exprTree(r, t)
      case x if x < 44 => nonEquiJoin(r)
      case x if x < 46 => lateralQ(r)
      case _           => qualifyQ(r, t)
    }
    (f"fuzz_$i%04d", sql)
  }

  def plans(seed: Long, count: Int): Seq[(String, String)] =
    (0 until count).map(plan(seed, _))
}
