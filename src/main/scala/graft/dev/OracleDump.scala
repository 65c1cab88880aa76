package graft.dev

/** Dev probe: dump the FULL oracle-SQL map (every registered query) to a
  * JSON file without executing any query — input for
  * `dev/bench_oracle.py` when refreshing the reference proxy, where a
  * full graft.Verify run would waste minutes re-materialising parquet
  * that the proxy never reads.
  *
  * Usage: runMain graft.dev.OracleDump <outFile>
  */
object OracleDump {
  def main(args: Array[String]): Unit = {
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = graft.SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(args(0)), json)
    println(s"dumped ${graft.SparkEntry.oracleSql.size} oracles to ${args(0)}")
  }
}
