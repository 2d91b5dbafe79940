package graft.plans

import graft.plans.QuantifiedSubqueries.{tokenize, Tok}

/** The reference's `map_type.*` function spellings (pg_map extension,
  * README + test_map_extract.py) → the engine's native MAP functions
  * (SURVEY §1.2 stores pg_map values as Spark MapType):
  *
  *   map_type.extract(m, k)     → element_at(m, k)
  *   map_type.cardinality(m)    → cardinality(m)
  *   map_type.entries(m)        → map_entries(m)
  *
  * Token-wise (string literals and quoted identifiers never match):
  * the identifier `map_type`, an adjacent `.`, and a known function
  * name rewrite as one unit; unknown `map_type.foo` spellings pass
  * through untouched and fail analysis loudly. The `->` operator on
  * MAP columns needs no text rewrite — [[JsonArrowRewrite]] already
  * routes it to pg_json_field, whose expression dispatches on the
  * input type ([[graft.functions.JsonArrow]]).
  */
object MapTypeRewrite {

  private val names = Map(
    "EXTRACT" -> "element_at",
    "CARDINALITY" -> "cardinality",
    "ENTRIES" -> "map_entries")

  def rewrite(sql: String): String = {
    val ts = tokenize(sql)
    if (!ts.exists(t => t.kind == 'w' && t.up == "MAP_TYPE")) return sql
    val sb = new StringBuilder
    var pos = 0
    var i = 0
    while (i < ts.length) {
      val t = ts(i)
      val hit = t.kind == 'w' && t.up == "MAP_TYPE" &&
        i + 2 < ts.length &&
        ts(i + 1).kind == 'o' && ts(i + 1).up == "." &&
        ts(i + 1).start == t.end &&
        ts(i + 2).kind == 'w' && names.contains(ts(i + 2).up) &&
        ts(i + 2).start == ts(i + 1).end
      if (hit) {
        sb.append(sql.substring(pos, t.start))
        sb.append(names(ts(i + 2).up))
        pos = ts(i + 2).end
        i += 3
      } else i += 1
    }
    sb.append(sql.substring(pos))
    sb.toString
  }
}
