package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver-contract partition: every registered query either carries a
  * DuckDB oracle or appears in the documented intentional no-oracle set —
  * never neither (a query the gate silently skips) and never both. Pure
  * map algebra, no Spark session. */
class EntryContractSpec extends AnyFunSuite {

  test("every query is oracled or documented as intentionally not") {
    val q = SparkEntry.queries.keySet
    val oracled = SparkEntry.oracleSql.keySet
    val documented = SparkEntry.intentionalNoOracle.keySet
    val silent = q -- oracled -- documented
    assert(silent.isEmpty,
      s"queries the gate would silently skip: ${silent.toSeq.sorted.mkString(", ")}")
    val both = oracled.intersect(documented)
    assert(both.isEmpty,
      s"queries both oracled and documented no-oracle: ${both.toSeq.sorted.mkString(", ")}")
  }

  test("no orphan entries: every oracle and every no-oracle note names a registered query") {
    val q = SparkEntry.queries.keySet
    val orphanOracles = SparkEntry.oracleSql.keySet -- q
    assert(orphanOracles.isEmpty,
      s"oracle SQL for unregistered queries: ${orphanOracles.toSeq.sorted.mkString(", ")}")
    val orphanNotes = SparkEntry.intentionalNoOracle.keySet -- q
    assert(orphanNotes.isEmpty,
      s"no-oracle notes for unregistered queries: ${orphanNotes.toSeq.sorted.mkString(", ")}")
  }
}
