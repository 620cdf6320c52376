package graft

/** Contract checks over the query inventory itself — the driver-facing
  * surface that correctness and bench runs key off. */
class InventorySpec extends SparkSpec {

  test("query names are unique") {
    val names = SparkEntry.inventory.map(_.name)
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys.toSeq
    assert(dups.isEmpty, s"duplicate query names: $dups")
  }

  test("bench short keys are unique (the JSON would silently merge timings)") {
    // Bench keys its JSON by the first-underscore prefix ("q31", "qs2")
    // to stay inside the harness's 2000-byte stdout window; two
    // inventory names sharing a prefix would silently min-merge their
    // timings into one entry — a growth hazard locked here instead of
    // discovered in a garbled BENCH_r{N}.json
    val keys = SparkEntry.inventory.map(_.name.takeWhile(_ != '_'))
    val dups = keys.groupBy(identity).filter(_._2.size > 1).keys.toSeq
    assert(dups.isEmpty, s"colliding bench keys: $dups")
  }

  test("every oracle belongs to a query and queries cover the inventory") {
    val names = SparkEntry.inventory.map(_.name).toSet
    assert(SparkEntry.oracleSql.keySet.subsetOf(names))
    assert(SparkEntry.queries.keySet == names)
    // ORDER BY discipline is spot-checked by the driver's hash compare;
    // here just assert every oracle is non-blank query text (some open
    // with a parenthesized or recursive CTE form)
    SparkEntry.oracleSql.values.foreach(sql => assert(sql.trim.nonEmpty))
  }
}
