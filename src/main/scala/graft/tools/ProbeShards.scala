package graft.tools

import graft.{Sessions, Tables, Scratch}
import org.apache.spark.sql.functions._

/** Dev probe: per-cell serving-shard sizes from
  * [[graft.operators.GraphSearch.serveShards]] on BOTH corpora of the
  * serve/don't-serve pair (x165's device) — the governance number for
  * the x170 sharding story: how big is a shard's closure relative to
  * the corpus, and does it stay bounded as the corpus grows?
  * `runMain graft.tools.ProbeShards` against `SPARK_GRAFT_SF_DIR`;
  * reads the frozen kgr/cgr Scratch artifacts (built by any
  * x142/x148/x149-family run at that SF). */
object ProbeShards {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val beam = 4; val hops = 3
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    val n = Tables(spark, dir, "embeddings").count()
    for (tag <- Seq("kgr", "cgr")) {
      val path = Scratch.dir(tag, dir)
      if (!new java.io.File(s"$path/g/_SUCCESS").exists())
        System.err.println(s"[probeshards] $tag artifact missing at $path" +
          " — run an x148/x149-family query at this SF first")
      else {
        val sn = spark.read.parquet(s"$path/sn")
        val g = spark.read.parquet(s"$path/g").select(col("u"), col("w"))
        val shards = graft.operators.GraphSearch
          .serveShards(g, sn, beam, hops)
        val stats = shards.select(
            size(coalesce(map_keys(col("gmap")),
              array().cast("array<long>"))).as("gk"),
            size(coalesce(map_keys(col("vmap")),
              array().cast("array<long>"))).as("vk"))
          .agg(count(lit(1)).as("cells"),
               avg(col("vk")).as("avg_vk"), max(col("vk")).as("max_vk"),
               avg(col("gk")).as("avg_gk"), max(col("gk")).as("max_gk"))
          .collect().head
        System.err.println(
          f"[probeshards] $tag n=$n cells=${stats.getLong(0)} " +
          f"avg_vmap=${stats.getDouble(1)}%.1f max_vmap=${stats.getInt(2)} " +
          f"avg_gmap=${stats.getDouble(3)}%.1f max_gmap=${stats.getInt(4)} " +
          f"(closure/corpus avg=${100.0 * stats.getDouble(1) / n}%.1f%%)")
      }
    }
    spark.stop()
  }
}
