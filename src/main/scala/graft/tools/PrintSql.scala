package graft.tools

/** Dev utility: dump one oracle SQL string from the registry to stdout
  * (syntax-check generated SQL in DuckDB without a Spark run).
  * Usage: PrintSql <gateName>
  */
object PrintSql {
  def main(args: Array[String]): Unit =
    println(graft.SparkEntry.oracleSql(args(0)))
}
