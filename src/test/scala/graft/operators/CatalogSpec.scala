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
    // the optional trailing `d` marks a second-scale DIGEST companion
    // (d07d/x02d/...: DigestGate over a VALUES-infeasible golden row) —
    // still a unique ID prefix for the bench's short keys
    val bad = Catalog.all.map(_.name)
      .filterNot(_.matches("[a-z][0-9]{2}d?_[a-z0-9_]+"))
    assert(bad.isEmpty, s"malformed names: $bad")
  }

  test("oracle SQL has no unresolved placeholders or empty bodies") {
    val bad = Catalog.oracleSql.collect {
      case (n, sql) if sql.trim.isEmpty || sql.contains("???") => n
    }
    assert(bad.isEmpty, s"bad oracle SQL: $bad")
  }

  test("oracle SQL carries no uninitialized-constant artifacts") {
    // a Scala val interpolating a NOT-YET-INITIALIZED numeric constant
    // (declaration-order hazard in a large object) silently bakes a 0
    // into the SQL — d30's budget once rendered as `cum <= 0` and its
    // shard modulus as `% 0`, zeroing the oracle while the Spark side
    // (a def, evaluated at call time) used the real dials. These
    // degenerate fragments have no legitimate use in any oracle here.
    val suspicious = Seq("% 0 ", "% 0)", "% 0\n", "<= 0)", ">= 0)",
      "* 0e0", "/ 0.0", "generate_series(1, 0)")
    val bad = Catalog.oracleSql.collect {
      case (n, sql) if suspicious.exists(sql.contains) =>
        n -> suspicious.filter(sql.contains)
    }
    assert(bad.isEmpty, s"zero-constant artifacts (forward-reference?): $bad")
  }
}
