package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: which candidate function names already exist in this
  * Spark build's FunctionRegistry.
  */
object FnProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = Seq(
      "div", "cot", "sind", "cosd", "tand", "asind", "acosd", "atand",
      "atan2d", "cbrt", "ln", "log10", "date_bin", "to_char",
      "generate_series", "sequence", "string_agg", "listagg", "strpos",
      "position", "locate", "left", "right", "split_part", "starts_with",
      "startswith", "width_bucket", "array_append", "array_prepend",
      "array_cat", "cardinality", "json_array_length", "get_json_object",
      "element_at", "map_entries", "date_trunc", "date_part", "extract",
      "make_date", "make_timestamp", "to_timestamp", "unix_micros",
      "timestamp_micros", "sequence", "explode", "regexp_like",
      "regexp_replace", "regexp_extract", "md5", "sha2", "encode",
      "decode", "to_hex", "hex", "unhex", "base64", "unbase64", "chr",
      "ascii", "repeat", "reverse", "lpad", "rpad", "btrim", "initcap",
      "bit_length", "octet_length", "mode", "any_value", "bool_and",
      "bool_or", "percentile", "percentile_cont", "percentile_disc",
      "median", "greatest", "least", "nullif", "nvl", "date_add",
      "date_diff", "datediff", "date_format", "from_unixtime",
      "unix_timestamp", "to_unix_timestamp", "try_divide", "try_cast",
      "random", "uuid", "pi", "degrees", "radians", "sign", "factorial",
      "trunc", "histogram_numeric", "approx_count_distinct", "corr",
      "covar_pop", "regr_slope", "regr_intercept", "regr_r2",
      "regr_count", "regr_avgx", "regr_avgy", "regr_sxx", "regr_syy",
      "regr_sxy", "arrays_zip", "zip_with", "aggregate", "transform",
      "filter", "exists", "forall", "reduce", "slice", "sort_array",
      "array_sort", "array_distinct", "array_contains", "array_position",
      "flatten", "posexplode", "inline", "stack", "from_json", "to_json",
      "json_tuple", "schema_of_json", "map_from_arrays", "map_concat",
      "str_to_map", "getbit", "overlay", "translate", "substring_index",
      "format_string", "printf", "levenshtein", "soundex", "crc32",
      "xxhash64", "hash", "murmur3_hash", "spark_partition_id",
      "input_file_name", "monotonically_increasing_id", "rand", "randn")
    val missing = names.distinct.filterNot(spark.catalog.functionExists)
    println("MISSING: " + missing.mkString(", "))
    spark.stop()
  }
}
