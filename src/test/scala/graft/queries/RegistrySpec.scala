package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract integrity: the registry is what Verify/Bench/the
  * correctness gate iterate — silent drift here silently shrinks the gate.
  */
class RegistrySpec extends AnyFunSuite {

  test("query names are unique across all registries") {
    val names = CoreQueries.all.map(_.name) ++ JoinQueries.all.map(_.name) ++
      FuncQueries.all.map(_.name) ++ MergeQueries.all.map(_.name) ++
      ServeQueries.all.map(_.name) ++ ExtQueries.all.map(_.name)
    val dupes = names.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    assert(dupes.isEmpty, s"duplicate query names: $dupes")
    assert(Registry.queryMap.size === names.size,
      "queryMap must carry every registered query exactly once")
  }

  test("every registered query carries a DuckDB oracle") {
    val missing = Registry.queryMap.keySet -- Registry.oracleMap.keySet
    assert(missing.isEmpty,
      s"queries without an oracle (driver falls back to rows-only): $missing")
  }

  test("oracles are non-empty SQL") {
    Registry.oracleMap.foreach { case (n, sql) =>
      assert(sql.trim.nonEmpty && sql.toUpperCase.contains("SELECT"), n)
    }
  }
}
