package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry-contract invariants that live outside any one operator:
  * documentation counts derived from the registry itself, so they
  * cannot drift as rounds add queries (ADVICE r11: README said 254
  * while the registry held 255).
  */
class ContractSpec extends AnyFunSuite {

  test("README's advertised query count equals the registry") {
    val readme = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")))
    val m = """(\d+)-query driver contract""".r.findFirstMatchIn(readme)
    assert(m.isDefined, "README must advertise the N-query contract")
    assert(m.get.group(1).toInt == SparkEntry.queries.size,
      s"README says ${m.get.group(1)}-query but the registry holds " +
        s"${SparkEntry.queries.size} — update README.md")
  }

  test("every oracleSql key names a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL without a query: $orphans")
  }
}
