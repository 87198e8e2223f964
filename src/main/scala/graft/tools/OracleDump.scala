package graft.tools

/** Dumps SparkEntry.oracleSql as JSON to the path in args(0) (default
  * /tmp/oracle_sql.json) WITHOUT starting a Spark session — for quick
  * DuckDB-side syntax/plan checks of oracle edits while a benchmark owns
  * the box. */
object OracleDump {
  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "/tmp/oracle_sql.json"
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case '\r' => "\\r"
        case '\t' => "\\t"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val json = graft.SparkEntry.oracleSql.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${jstr(k)}: ${jstr(v)}" }
      .mkString("{", ",\n", "}")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      json.getBytes("UTF-8"))
    println(s"wrote ${graft.SparkEntry.oracleSql.size} oracle entries to $out")
  }
}
