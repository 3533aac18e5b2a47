package graft

import org.apache.spark.sql.SparkSessionExtensions
import graft.functions.expr.{CdcBounds, JaroWinkler, MinHashSig, MinHashSigMd5, NgramJaccard, SimHash64, SimHashMd5, SortedLowerBound, VecDot}

/** SparkSessionExtensions entry point: registers the engine's native
  * functions so SQL users get them too.
  *
  * Usage: `--conf spark.sql.extensions=graft.GraftExtensions`, or the
  * per-function `register(spark)` helpers on an existing session. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(MinHashSig.registration)
    ext.injectFunction(MinHashSigMd5.registration)
    ext.injectFunction(SimHash64.registration)
    ext.injectFunction(SimHashMd5.registration)
    ext.injectFunction(VecDot.registration)
    ext.injectFunction(NgramJaccard.registration)
    ext.injectFunction(CdcBounds.registration)
    ext.injectFunction(SortedLowerBound.registration)
    ext.injectFunction(JaroWinkler.registration)
    // inequality temporal joins (abs(Δsec) <= gap with no equi key) are
    // rewritten to banded equi-joins instead of nested-loop scans
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
  }
}
