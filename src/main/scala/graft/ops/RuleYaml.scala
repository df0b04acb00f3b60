package graft.ops

/** Loader for the reference's YAML rule catalog so DQ rule sets can be
  * declared as data (reference: data-quality/dq_rules.yaml:1-37, consumed
  * by dq_checks.py:63-98). The grammar is deliberately tiny — top-level
  * `table:` keys, each holding a list of `- column/rule/min/max/reference/
  * message` mappings — so a dependency-free line parser covers it exactly
  * (the environment has no YAML library and the reference uses no other
  * YAML features).
  */
object RuleYaml {

  /** Parse a rule catalog: returns rules in file order. Unknown rule
    * names fail fast with the offending line. */
  def parse(yaml: String): Seq[Quality.Rule] = {
    var table: String = null
    var item: Map[String, String] = null
    val out = Seq.newBuilder[Quality.Rule]

    def flush(): Unit = if (item != null) {
      out += build(table, item)
      item = null
    }

    yaml.linesIterator.foreach { raw =>
      val line = raw.takeWhile(_ != '#').replaceAll("\\s+$", "")
      val trimmed = line.trim
      if (trimmed.nonEmpty) {
        if (!line.startsWith(" ") && trimmed.endsWith(":")) {
          flush(); table = trimmed.dropRight(1)
        } else if (trimmed.startsWith("- ")) {
          flush()
          item = Map(kv(trimmed.drop(2)))
        } else if (item != null) {
          item += kv(trimmed)
        }
      }
    }
    flush()
    out.result()
  }

  private def kv(s: String): (String, String) = {
    val i = s.indexOf(':')
    require(i > 0, s"not a key: value line: $s")
    (s.take(i).trim, stripQuotes(s.drop(i + 1).trim))
  }

  private def stripQuotes(v: String): String =
    if (v.length >= 2 && v.head == '"' && v.last == '"') v.substring(1, v.length - 1)
    else v

  private def build(table: String, m: Map[String, String]): Quality.Rule = {
    require(table != null, s"rule item before any table heading: $m")
    val column = m("column")
    m("rule") match {
      case "not_null" => Quality.NotNull(table, column)
      case "unique"   => Quality.Unique(table, column)
      case "between"  =>
        Quality.Between(table, column, m("min").toDouble, m("max").toDouble)
      case "foreign_key" =>
        val Array(refTable, refColumn) = m("reference").split("\\.", 2)
        Quality.ForeignKey(table, column, refTable, refColumn)
      case other => throw new IllegalArgumentException(s"unknown rule: $other")
    }
  }
}
