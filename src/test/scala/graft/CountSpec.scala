package graft
import org.scalatest.funsuite.AnyFunSuite

/** Registration integrity: every query id is unique across modules
  * (SparkEntry fails fast — this drives that path), every oracle id
  * has a query, and the declared SURVEY §2 denominators hold. */
class CountSpec extends AnyFunSuite {
  test("query/oracle registries: unique ids, oracles subset of queries") {
    val qs = SparkEntry.queries   // throws on duplicate ids
    val os = SparkEntry.oracleSql // throws on duplicate ids
    assert((os.keySet -- qs.keySet).isEmpty,
      s"oracles without a query: ${(os.keySet -- qs.keySet).mkString(", ")}")
    // SURVEY §2 count paragraph: 490 declared rows, 477 oracle-checked,
    // 13 declared-✗ (the FINAL set, enumeration closed in r11).
    assert(qs.size == 490, s"queries=${qs.size}")
    assert(os.size == 477, s"oracles=${os.size}")
    assert((qs.keySet -- os.keySet).size == 13)
  }
}
