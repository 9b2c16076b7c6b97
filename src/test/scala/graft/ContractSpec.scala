package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract guards: the correctness gate compares each declared
  * query against its DuckDB oracle, so drift between the two maps (a
  * query without an oracle silently downgrades to a rows-only check; an
  * oracle without a query is dead SQL) should fail a unit test, not be
  * discovered in a round report. Pure map inspection — no SparkSession.
  */
class ContractSpec extends AnyFunSuite {

  test("every declared query has an oracle and vice versa") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(q.diff(o).isEmpty, s"queries without oracle: ${q.diff(o).toSeq.sorted}")
    assert(o.diff(q).isEmpty, s"oracles without query: ${o.diff(q).toSeq.sorted}")
  }

  test("every oracle ends in a total ORDER BY (deterministic compare)") {
    val missing = SparkEntry.oracleSql.collect {
      case (name, sql) if !sql.toUpperCase.contains("ORDER BY") => name
    }
    assert(missing.isEmpty, s"oracles without ORDER BY: ${missing.toSeq.sorted}")
  }

  test("query names are stable identifiers (lower_snake, nonempty)") {
    val bad = SparkEntry.queries.keys.filterNot(_.matches("[a-z][a-z0-9_]*"))
    assert(bad.isEmpty, s"non-conforming query names: ${bad.toSeq.sorted}")
  }
}
