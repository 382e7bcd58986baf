package graft.plans

/** Test-scope bridge to the package-private injected-marker helpers, so
  * specs outside `graft.plans` (ExtensionsSpec's marker-survival pin) can
  * read markers off optimized plans without widening RewriteSupport's
  * visibility.
  */
object MarkerTestAccess {
  val InjectedMarker: org.apache.spark.sql.catalyst.trees.TreeNodeTag[String] =
    RewriteSupport.InjectedMarker

  def markerOf(lr: org.apache.spark.sql.catalyst.plans.logical.LocalRelation): Option[String] =
    RewriteSupport.injectedMarkerOf(lr)
}
