package graft

import scala.jdk.CollectionConverters._

/** README's coverage claims are checked mechanically: every `q_*` name
  * in the coverage map must be a declared query, every declared query
  * must appear in the map, and the stated query count must match —
  * hand-edited docs drift; this spec doesn't. */
class DocsSpec extends SparkSpecBase {

  private lazy val readme =
    java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get("README.md")).asScala.mkString("\n")

  test("every q_* token in README exists as a declared query") {
    val mentioned = "q_[a-z0-9_]+".r.findAllIn(readme).toSet
    val declared = SparkEntry.queries.keySet
    val ghosts = mentioned -- declared
    assert(ghosts.isEmpty, s"README names unknown queries: $ghosts")
  }

  test("every declared query is documented in the README coverage map") {
    val mentioned = "q_[a-z0-9_]+".r.findAllIn(readme).toSet
    val undocumented = SparkEntry.queries.keySet -- mentioned
    assert(undocumented.isEmpty, s"undocumented queries: $undocumented")
  }

  test("the stated query count matches the declared inventory") {
    val stated = "Every one of the (\\d+) declared queries".r
      .findFirstMatchIn(readme).map(_.group(1).toInt)
    assert(stated.contains(SparkEntry.queries.size),
      s"README says ${stated.orNull}, inventory has ${SparkEntry.queries.size}")
  }

  test("every query has an oracle and every oracle has a query") {
    assert(SparkEntry.oracleSql.keySet == SparkEntry.queries.keySet)
  }
}
