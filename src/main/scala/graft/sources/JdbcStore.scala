package graft.sources

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** JDBC interop with a reference-shaped vector store.
  *
  * The reference persists documents in an embedded SQL database with the
  * embedding stored as JSON text and re-parsed on every read
  * (DotNetVectorSearch.Prepare/Program.cs:92-106 writes SQLite rows;
  * WebAPI/Services/VectorSearchService.cs:142-149 reads them and
  * JSON-decodes the vector). This module reproduces that storage shape on
  * Apache Derby — the embedded JDBC database that ships with Spark — so the
  * engine can demonstrate the first migration a reference user performs:
  * point Spark at the existing SQL store and query it.
  *
  * Scale notes:
  *  - The read is a partitioned `spark.read.jdbc` (predicate-split on the
  *    id column), the standard shape for parallel ingest from an RDBMS; on
  *    a real cluster each executor opens its own connection and reads one
  *    id range.
  *  - `from_json(embedding, 'array<float>')` is the reference's per-read
  *    vector decode, expressed as a codegen'd Catalyst expression instead
  *    of app-side JSON parsing. In a real migration you run this decode
  *    ONCE into parquet; keeping it in the query here is deliberate parity
  *    with the reference's per-request cost model.
  */
object JdbcStore {

  private val built = new ConcurrentHashMap[String, (String, Long)]()

  private def url(dbDir: String) = s"jdbc:derby:$dbDir;create=true"

  private val props = {
    val p = new java.util.Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  /** Load the sf dir's embeddings into a Derby table shaped like the
    * reference store (id + JSON-text embedding + label), once per JVM per
    * sf dir. Returns (dbDir, max id) for partitioned reads.
    */
  def ensureStore(spark: SparkSession, sfDir: String): (String, Long) =
    built.computeIfAbsent(sfDir, { _ =>
      // MD5 of the full path, not hashCode: a collision would silently
      // point two sf dirs at the same store
      val dbDir = s"${sys.props("java.io.tmpdir")}/graft-derby-" +
        graft.operators.Ann.pathToken(sfDir)
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val asStore = emb.select(
        col("vec_id"),
        // the reference's storage format: the vector as JSON text
        to_json(col("embedding")).as("embedding"),
        col("label"))
      val maxId = emb.agg(max("vec_id")).head().getLong(0)
      // single writer: embedded Derby locks per-table; the store build is a
      // one-time setup step, not the measured query path
      asStore.coalesce(1).write.mode("overwrite")
        .jdbc(url(dbDir), "GRAFT_EMBEDDINGS", props)
      (dbDir, maxId)
    })

  /** Bench-harness hook: forget the built stores so a second load can be
    * timed cold (the Derby dir is rewritten in place, mode=overwrite).
    */
  private[graft] def resetMemos(): Unit = built.clear()

  /** Partitioned JDBC scan of the store + JSON vector decode back to
    * `array<float>`. Bit-exact round-trip: Spark writes floats via
    * shortest-round-trip JSON and reads them back to the identical float.
    */
  def readEmbeddings(spark: SparkSession, sfDir: String, numPartitions: Int = 4): DataFrame = {
    val (dbDir, maxId) = ensureStore(spark, sfDir)
    spark.read.jdbc(
        url(dbDir), "GRAFT_EMBEDDINGS",
        columnName = "vec_id", lowerBound = 0L, upperBound = maxId + 1,
        numPartitions = numPartitions, connectionProperties = props)
      .select(
        col("vec_id"),
        from_json(col("embedding"), lit("array<float>")).as("embedding"),
        col("label"))
  }
}
