package graft.tools

import java.nio.file.{Files, Paths}
import graft.Sessions
import graft.io.TableIo
import graft.pipeline._

/** Dev tool: regenerate the checked-in golden CSV outputs for the PUA/CPA
  * fixture pipelines (src/test/resources/golden/). Run after an
  * intentional semantic change, then review the diff — the goldens are
  * byte-compared by PipelineGoldenSpec. */
object GenGolden {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("4")
    import PayrollFixtures._
    val outDir = Paths.get(
      sys.env.getOrElse("GOLDEN_DIR", "src/test/resources/golden"))
    Files.createDirectories(outDir)
    val pua = PuaPipeline.run(PuaPipeline.Inputs(
      df(spark, PuaColumns, PuaRows), df(spark, TsOrgColumns, TsOrgRows),
      df(spark, TsDeptColumns, TsDeptRows),
      df(spark, OvertimeColumns, OvertimeRows), df(spark, TeMColumns, TeMRows)))
    Files.write(outDir.resolve("pua_output.csv"), TableIo.csvBytes(pua))
    val cpa = CpaPipeline.run(CpaPipeline.Inputs(
      df(spark, CertColumns, CertBwRows), df(spark, CertColumns, CertMnRows),
      df(spark, TsOrgColumns, TsOrgRows), df(spark, TsDeptColumns, TsDeptRows),
      df(spark, OvertimeColumns, OvertimeRows), df(spark, TeMColumns, TeMRows)),
      FixedClock)
    Files.write(outDir.resolve("cpa_output.csv"), TableIo.csvBytes(cpa))
    println(s"[golden] wrote ${outDir.toAbsolutePath}")
    spark.stop()
  }
}
