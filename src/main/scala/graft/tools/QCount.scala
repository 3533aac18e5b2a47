package graft.tools
object QCount {
  def main(a: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    println(s"queries=${q.size} oracles=${o.size} oracleOnly=${(o--q).toSeq.sorted} noOracle=${(q--o).toSeq.sorted}")
  }
}
