package graft.plans

import org.apache.spark.sql.SparkSession

/** Test-scope bridge to package-private catalog internals (the
  * MarkerTestAccess posture): lets specs outside `graft.plans` pin the
  * per-(path, generation) stats cache without widening visibility.
  */
object CatalogTestAccess {
  def currentStats(spark: SparkSession, path: String,
                   e: IvfIndexRegistry.Entry): (String, Option[Seq[(Int, Long)]]) =
    IvfIndexRegistry.currentStats(spark, path, e)
}
