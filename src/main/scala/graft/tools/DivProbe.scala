package graft.tools
import graft.Sessions
/** Dev tool: Spark DIV semantics on negatives vs DuckDB floor //. */
object DivProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("2")
    spark.sql("SELECT -7 DIV 2 AS a, 7 DIV -2 AS b, -7 DIV -2 AS c")
      .show()
    spark.stop()
  }
}
