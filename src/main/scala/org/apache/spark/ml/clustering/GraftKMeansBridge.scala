package org.apache.spark.ml.clustering

import org.apache.spark.ml.util.Identifiable
import org.apache.spark.mllib.clustering.{KMeansModel => MLlibKMeansModel}
import org.apache.spark.mllib.linalg.{Vector => OldVector}

/** Constructs an `ml.KMeansModel` from already-trained centers — the
  * `private[ml]` constructor a locally-trained fit
  * ([[org.apache.spark.mllib.clustering.GraftLocalKMeans]]) needs to hand
  * its centers back as a regular model whose `transform` /
  * `clusterCenters` behave exactly like a `fit`-produced one (same
  * parent-model predict path, same distance-measure statistics).
  */
object GraftKMeansBridge {

  def model(centers: Array[OldVector], distanceMeasure: String,
            featuresCol: String, predictionCol: String): KMeansModel = {
    val parent = new MLlibKMeansModel(centers, distanceMeasure, 0.0, -1)
    new KMeansModel(Identifiable.randomUID("kmeans"), parent)
      .setFeaturesCol(featuresCol)
      .setPredictionCol(predictionCol)
  }
}
