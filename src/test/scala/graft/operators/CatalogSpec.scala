package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Integrity of the driver contract: `Catalog.all` feeds two maps
  * (queries, oracleSql) keyed by name — a duplicate name would silently
  * drop a query in `toMap`, and an oracle without a query (or a
  * malformed name) would corrupt the driver's correctness gate.
  */
class CatalogSpec extends AnyFunSuite {

  test("registered query names are unique (toMap drops duplicates silently)") {
    val names = Catalog.all.map(_.name)
    val dups = names.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    assert(dups.isEmpty, s"duplicate query names: $dups")
    assert(Catalog.queries.size == names.size)
  }

  test("every oracle key has a registered query") {
    val missing = Catalog.oracleSql.keySet -- Catalog.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("query names follow the family_name convention") {
    val bad = Catalog.all.map(_.name)
      .filterNot(_.matches("[a-z][0-9]{2}_[a-z0-9_]+"))
    assert(bad.isEmpty, s"malformed names: $bad")
  }

  test("oracle SQL has no unresolved placeholders or empty bodies") {
    val bad = Catalog.oracleSql.collect {
      case (n, sql) if sql.trim.isEmpty || sql.contains("???") => n
    }
    assert(bad.isEmpty, s"bad oracle SQL: $bad")
  }
}
