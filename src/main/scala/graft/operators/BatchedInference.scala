package graft.operators

import org.apache.spark.sql.Dataset
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.LongAccumulator

import graft.expressions.TokenHashes
import graft.functions.TextOps

/** Batched model-inference execution shape: how a real embedding model slots
  * into the engine (the reference's ONNX session,
  * DotNetVectorSearch.Core/Embeddings/E5MultilingualEmbeddings.cs:121-160 +
  * Core/RuntimeProvider/OnnxRuntimeProvider.cs:33-68).
  *
  * The contract this operator fixes, independent of which model backs it:
  *  - the model handle is BROADCAST (weights ship to each executor once, not
  *    per task closure),
  *  - the session is initialized ONCE PER PARTITION (ONNX/JNI session init is
  *    the expensive part; `initCounter` lets tests assert this),
  *  - rows stream through in BATCHES of `batchSize` (model runtimes amortize
  *    per-call overhead across a batch), never materializing a partition.
  *
  * At 100 TB this is a map-only stage: it parallelizes with the scan, no
  * shuffle, and executor count scales inference throughput linearly.
  *
  * The bundled [[HashingEmbedder]] is the deterministic stand-in model (same
  * divergence note as TextOps: SURVEY.md §7.0) — it replicates
  * TextOps.hashEmbed bit-for-bit on the JVM side, so the batched path is
  * verified against the per-row expression path AND the DuckDB oracle, not
  * just smoke-checked. A real ONNX embedder is a drop-in [[Embedder]].
  */
object BatchedInference {

  case class DocText(doc_id: Long, text: String)
  case class DocVec(doc_id: Long, embedding: Array[Double])

  /** The model contract: a batch of texts in, one vector per text out. */
  trait Embedder extends Serializable {
    def embedBatch(texts: Array[String]): Array[Array[Double]]
  }

  /** Deterministic feature-hashing model — bit-identical to the Catalyst
    * expression chain TextOps.hashEmbed (tokenize via TokenHashes.compute,
    * bucket h%dim, sign by h%(2·dim)<dim, L2 normalize with the 1e-12
    * pass-through, all double arithmetic in the same order).
    */
  class HashingEmbedder(dim: Int = TextOps.DefaultDim) extends Embedder {
    override def embedBatch(texts: Array[String]): Array[Array[Double]] =
      texts.map { t =>
        val hs = TokenHashes.compute(UTF8String.fromString(t))
        val acc = new Array[Double](dim)
        val n = hs.numElements()
        var i = 0
        while (i < n) {
          val h = hs.getLong(i)
          val sign = if (h % (2L * dim) < dim) 1.0 else -1.0
          acc((h % dim).toInt) += sign
          i += 1
        }
        var ss = 0.0
        var j = 0
        while (j < dim) { ss += acc(j) * acc(j); j += 1 }
        val nrm = math.sqrt(ss)
        if (nrm > 1e-12) {
          var k = 0
          while (k < dim) { acc(k) /= nrm; k += 1 }
        }
        acc
      }
  }

  /** Embed a corpus with one broadcast model, one init per partition, rows
    * streamed through in batches.
    *
    * @param modelFactory builds the model handle; called once per partition
    *                     on the executor (session init happens there, not on
    *                     the driver)
    * @param initCounter  optional accumulator bumped once per model init —
    *                     lets tests assert the amortization contract
    */
  def embedPartitions(docs: Dataset[DocText],
                      modelFactory: () => Embedder,
                      batchSize: Int = 64,
                      initCounter: Option[LongAccumulator] = None): Dataset[DocVec] = {
    import docs.sparkSession.implicits._
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    val bc = docs.sparkSession.sparkContext.broadcast(modelFactory)
    docs.mapPartitions { rows =>
      if (!rows.hasNext) Iterator.empty
      else {
        val model = bc.value.apply() // the one per-partition init
        initCounter.foreach(_.add(1L))
        rows.grouped(batchSize).flatMap { chunk =>
          val vecs = model.embedBatch(chunk.map(_.text).toArray)
          chunk.iterator.zip(vecs.iterator).map { case (d, v) => DocVec(d.doc_id, v) }
        }
      }
    }
  }
}
