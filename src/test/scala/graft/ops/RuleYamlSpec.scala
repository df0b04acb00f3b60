package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class RuleYamlSpec extends AnyFunSuite {
  import Quality._

  private val catalog =
    """# fixture-schema rule catalog in the reference's dq_rules.yaml grammar
      |orders:
      |  - column: o_orderdate
      |    rule: not_null
      |    message: "order date cannot be null"
      |
      |  - column: o_custkey
      |    rule: unique
      |
      |lineitem:
      |  - column: l_quantity
      |    rule: between
      |    min: 5
      |    max: 45
      |
      |  - column: l_partkey
      |    rule: foreign_key
      |    reference: part.p_partkey
      |    message: "invalid part"
      |""".stripMargin

  test("parses all four rule types with table scoping") {
    assert(RuleYaml.parse(catalog) == Seq(
      NotNull("orders", "o_orderdate"),
      Unique("orders", "o_custkey"),
      Between("lineitem", "l_quantity", 5.0, 45.0),
      ForeignKey("lineitem", "l_partkey", "part", "p_partkey")))
  }

  test("unknown rule type fails fast") {
    intercept[IllegalArgumentException] {
      RuleYaml.parse("t:\n  - column: c\n    rule: bogus\n")
    }
  }

  test("empty input parses to no rules") {
    assert(RuleYaml.parse("").isEmpty)
  }
}
