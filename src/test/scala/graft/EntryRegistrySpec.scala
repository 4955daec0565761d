package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry hygiene for the driver contract: every query has an oracle
  * and vice versa, and the SOURCE never declares an entry key twice —
  * Scala Map keeps the last duplicate silently, which once shadowed a
  * live gate entry (round 7's events_sessionize collision). */
class EntryRegistrySpec extends AnyFunSuite {

  test("queries and oracleSql cover exactly the same entry names") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o) === Set.empty[String], "queries missing oracles")
    assert((o -- q) === Set.empty[String], "oracles missing queries")
  }

  test("no entry key is declared more than twice in the source " +
      "(queries + oracle; a third literal means a silent Map shadow)") {
    val src = scala.io.Source.fromFile(
      "src/main/scala/graft/SparkEntry.scala", "UTF-8").mkString
    val keys = "\"([a-z0-9_]+)\" ->".r
      .findAllMatchIn(src).map(_.group(1)).toSeq
    val counts = keys.groupBy(identity).view.mapValues(_.size)
    val dups = counts.filter(_._2 > 2).keys.toSeq.sorted
    assert(dups.isEmpty, s"entry keys declared >2x: $dups")
    // and every registered entry appears exactly twice in the source
    val under = SparkEntry.queries.keySet
      .filter(k => counts.getOrElse(k, 0) != 2).toSeq.sorted
    assert(under.isEmpty, s"entry keys not declared exactly twice: $under")
  }

  test("committed REGISTRY.md matches the registry (regenerate with " +
      "runMain graft.tools.RegistryTable after adding entries)") {
    val path = java.nio.file.Paths.get("REGISTRY.md")
    assert(java.nio.file.Files.exists(path),
      "REGISTRY.md missing — run: runMain graft.tools.RegistryTable")
    val committed = java.nio.file.Files.readString(path)
    // full-content parity, not just counts: a renamed entry or a
    // changed oracle kind must also force a regenerate
    assert(committed === graft.tools.RegistryTable.render(),
      "REGISTRY.md is stale — run: runMain graft.tools.RegistryTable")
  }
}
