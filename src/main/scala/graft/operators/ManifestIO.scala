package graft.operators

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupReadSupport}
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.hadoop.util.HadoopOutputFile
import org.apache.parquet.schema.MessageTypeParser

/** Driver-direct parquet I/O for KB-scale manifest metadata (round-14
  * optimization, guide §5 "the driver should do almost no data work" —
  * inverted: metadata work should do NO cluster jobs). Manifest
  * resolution previously ran `spark.read.parquet(dir).collect()` per
  * version directory — a full scheduler round-trip (schema-inference
  * read + collect job, ~100-150 ms each under AQE) for a file holding a
  * handful of O(change) rows. A table at version V resolves up to
  * [[TxnLog.CheckpointInterval]] manifests, and the tt_* family walks
  * several versions per query, so one query paid dozens of jobs for a
  * few KB of metadata. Delta/Iceberg read their logs exactly this way:
  * the _delta_log / manifest-list is parsed in the driver process, only
  * DATA files become cluster scans.
  *
  * Files written here are standard parquet, read identically by
  * `spark.read.parquet` (TxnLogSpec forges and reads manifests with
  * Spark) and by the DuckDB oracle's
  * `read_parquet('__TT_MANIFESTS__/x/x.parquet', hive_partitioning=true)`
  * glob — the schema below mirrors what the Spark writer produced
  * (optional UTF8 strings, optional int64 stats, required boolean).
  */
private[graft] object ManifestIO {

  /** One raw manifest row: (action, kind, file_name, stats..., data_change). */
  case class ActionRow(action: String, kind: String, fileName: String,
                       minId: Option[Long], maxId: Option[Long],
                       nRows: Option[Long], dataChange: Boolean)

  private val Schema = MessageTypeParser.parseMessageType(
    """message manifest {
      |  optional binary action (UTF8);
      |  optional binary kind (UTF8);
      |  optional binary file_name (UTF8);
      |  optional int64 min_id;
      |  optional int64 max_id;
      |  optional int64 n_rows;
      |  required boolean data_change;
      |}""".stripMargin)

  /** Read every data file of a manifest/checkpoint directory in the
    * driver process. Tolerant of rows without the newer columns exactly
    * like the Spark-read path it replaces: absent `action` reads as
    * "add", absent stats as None, absent `data_change` as true.
    */
  def readDir(conf: Configuration, dir: String): Seq[ActionRow] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p))
      throw new java.io.FileNotFoundException(s"manifest dir not found: $dir")
    val files = fs.listStatus(p).map(_.getPath)
      .filter { f =>
        val n = f.getName
        !n.startsWith("_") && !n.startsWith(".") &&
          (n.endsWith(".parquet") || !n.contains("."))
      }
      .sortBy(_.getName)
    val out = Seq.newBuilder[ActionRow]
    files.foreach { f =>
      val reader = ParquetReader
        .builder(new GroupReadSupport(), f).withConf(conf).build()
      try {
        var g = reader.read()
        while (g != null) {
          val t = g.getType
          def has(n: String): Boolean =
            t.containsField(n) && g.getFieldRepetitionCount(n) > 0
          def str(n: String, dflt: String): String =
            if (has(n)) g.getString(n, 0) else dflt
          def lng(n: String): Option[Long] =
            if (has(n)) Some(g.getLong(n, 0)) else None
          out += ActionRow(
            str("action", "add"), str("kind", null), str("file_name", null),
            lng("min_id"), lng("max_id"), lng("n_rows"),
            if (has("data_change")) g.getBoolean("data_change", 0) else true)
          g = reader.read()
        }
      } finally reader.close()
    }
    out.result()
  }

  /** Per-file (min, max, n_rows) of a long column, straight from the
    * parquet footer's row-group statistics — the stats the file's own
    * writer already computed. Replaces a full re-read of freshly staged
    * data (`spark.read.parquet(tmp).groupBy(file).agg(min,max,count)`)
    * with one footer read per file: commits cost O(files) driver
    * metadata I/O instead of a second corpus pass (guide §1.2 "don't
    * compute things you throw away"). Returns None when the column is
    * absent or any row group lacks usable stats — the caller's
    * stale-safe convention (a file with no stats is always kept).
    */
  def footerStats(conf: Configuration, file: Path,
                  column: String): Option[(Long, Long, Long)] = {
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(file, conf))
    try {
      val blocks = reader.getFooter.getBlocks
      var n = 0L
      var mn = Long.MaxValue
      var mx = Long.MinValue
      var ok = true
      val it = blocks.iterator()
      while (it.hasNext && ok) {
        val b = it.next()
        n += b.getRowCount
        val ccs = b.getColumns
        var found = false
        val cit = ccs.iterator()
        while (cit.hasNext && !found) {
          val cc = cit.next()
          if (cc.getPath.toDotString == column) {
            found = true
            val st = cc.getStatistics
            if (st == null || st.isEmpty || !st.hasNonNullValue) ok = false
            else st.genericGetMin match {
              case l: java.lang.Long =>
                mn = math.min(mn, l.longValue())
                mx = math.max(mx,
                  st.genericGetMax.asInstanceOf[java.lang.Long].longValue())
              case _ => ok = false
            }
          }
        }
        if (!found) ok = false
      }
      if (ok && n > 0) Some((mn, mx, n)) else None
    } finally reader.close()
  }

  /** Write `rows` as one parquet part file under `dir`, with the same
    * version-slot semantics as the Spark `errorifexists`/`overwrite`
    * writer it replaces: the file lands in a hidden tmp directory that
    * is RENAMED into the slot, and a collision (slot already taken, or
    * another writer won the rename) dies loudly before any pointer
    * flip. The rename-into-place is strictly tighter than the Spark
    * path's check-then-commit window.
    */
  def writeDir(conf: Configuration, dir: String, rows: Seq[ActionRow],
               errorIfExists: Boolean): Unit = {
    val dest = new Path(dir)
    val fs = dest.getFileSystem(conf)
    if (errorIfExists && fs.exists(dest))
      throw new org.apache.hadoop.fs.FileAlreadyExistsException(
        s"manifest slot already committed: $dir")
    if (!errorIfExists && fs.exists(dest)) fs.delete(dest, true)
    val tmp = new Path(dest.getParent,
      s".mtmp-${java.util.UUID.randomUUID().toString.take(8)}")
    fs.mkdirs(tmp)
    val part = new Path(tmp,
      s"part-00000-${java.util.UUID.randomUUID()}.snappy.parquet")
    val writer = ExampleParquetWriter
      .builder(HadoopOutputFile.fromPath(part, conf))
      .withConf(conf)
      .withType(Schema)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
    try {
      val f = new SimpleGroupFactory(Schema)
      rows.foreach { r =>
        val g = f.newGroup()
        if (r.action != null) g.append("action", r.action)
        if (r.kind != null) g.append("kind", r.kind)
        if (r.fileName != null) g.append("file_name", r.fileName)
        r.minId.foreach(v => g.append("min_id", v))
        r.maxId.foreach(v => g.append("max_id", v))
        r.nRows.foreach(v => g.append("n_rows", v))
        g.append("data_change", r.dataChange)
        writer.write(g)
      }
    } finally writer.close()
    fs.create(new Path(tmp, "_SUCCESS"), true).close()
    def fail(): Nothing = {
      fs.delete(tmp, true)
      throw new org.apache.hadoop.fs.FileAlreadyExistsException(
        s"manifest slot already committed: $dir")
    }
    if (errorIfExists && fs.exists(dest)) fail()
    if (!fs.rename(tmp, dest)) fail()
    // local-FS rename moves INTO an existing dest (mv semantics): detect
    // a racer's slot win and back out instead of nesting silently
    val nested = new Path(dest, tmp.getName)
    if (fs.exists(nested)) {
      fs.delete(nested, true)
      if (errorIfExists) throw new org.apache.hadoop.fs.FileAlreadyExistsException(
        s"manifest slot already committed: $dir")
    }
  }
}
