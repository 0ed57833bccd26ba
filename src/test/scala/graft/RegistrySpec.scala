package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants: the queries Map is built from a Seq, so
  * a duplicate name would silently drop a query (and its oracle) —
  * pinned here instead of discovered by a shrunk correctness report. */
class RegistrySpec extends AnyFunSuite {

  test("query names are unique and oracle keys all resolve") {
    val all = SparkEntry.modules.flatMap(_.queries)
    val names = all.map(_.name)
    assert(names.distinct.size == names.size,
      s"duplicate query names: ${names.diff(names.distinct).distinct.mkString(",")}")
    assert(SparkEntry.queries.size == all.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    // every qNN prefix is unique too (the driver reports by name)
    val prefixes = names.map(_.takeWhile(_ != '_'))
    assert(prefixes.distinct.size == prefixes.size,
      s"duplicate query number prefixes: ${prefixes.diff(prefixes.distinct).distinct.mkString(",")}")
  }
}
