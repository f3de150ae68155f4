package graft.sources.v2

import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces, SupportsRead, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DSv2 TABLE CATALOG over the edge-table format — the piece that makes
  * the connector's tables first-class SQL citizens, Iceberg-catalog
  * style. A table is a shard directory under the configured warehouse
  * root; namespaces are directories. Register and use:
  *
  * {{{
  * spark.conf.set("spark.sql.catalog.graft", classOf[EdgeCatalog].getName)
  * spark.conf.set("spark.sql.catalog.graft.warehouse", "/data/graft")
  * spark.sql("CREATE TABLE graft.db.edges (src BIGINT, dst BIGINT, w BIGINT)")
  * spark.sql("INSERT INTO graft.db.edges SELECT ...")
  * spark.sql("SELECT * FROM graft.db.edges VERSION AS OF 1")   // snapshot
  * }}}
  *
  * `VERSION AS OF e` resolves through `loadTable(ident, version)` to an
  * epoch-pinned [[EdgeTable]] — the SQL form of the reader's
  * `asOfEpoch` option, planning only shards committed at epochs <= e
  * (and refusing, downstream, snapshots a compaction expired).
  * `TIMESTAMP AS OF` is rejected: commit epochs are logical times with
  * no wall-clock, exactly the reference's timely timestamps
  * (/root/reference/examples/motif.rs:140-144).
  *
  * Scale note: every operation is O(1) directory metadata against the
  * warehouse filesystem — the catalog holds NO driver state, so a
  * 100K-table warehouse costs nothing until a table is actually read. */
class EdgeCatalog extends TableCatalog with SupportsNamespaces
    with org.apache.spark.sql.connector.catalog.FunctionCatalog {

  private var catName: String = _
  private var warehouse: Path = _
  private def fs: FileSystem =
    FileSystem.get(warehouse.toUri, new Configuration())

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catName = name
    val w = options.get("warehouse")
    require(w != null,
      s"catalog $name requires spark.sql.catalog.$name.warehouse")
    warehouse = new Path(w)
  }
  override def name(): String = catName

  private def dirOf(ns: Array[String]): Path =
    ns.foldLeft(warehouse)((p, n) => new Path(p, n))
  private def dirOf(ident: Identifier): Path =
    new Path(dirOf(ident.namespace()), ident.name())

  // ---- tables ----------------------------------------------------------

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val d = dirOf(namespace)
    if (!fs.exists(d)) throw new NoSuchNamespaceException(namespace)
    fs.listStatus(d).filter(_.isDirectory)
      .map(s => Identifier.of(namespace, s.getPath.getName))
      .sortBy(_.name())
  }

  override def tableExists(ident: Identifier): Boolean =
    fs.exists(dirOf(ident))

  override def loadTable(ident: Identifier): Table = {
    val d = dirOf(ident)
    if (fs.exists(d)) return new EdgeTable(d.toString)
    // Iceberg-style METADATA TABLE: `<table>.snapshots` resolves (when no
    // real table shadows the name) to the commit history — one row per
    // epoch, computed from the same driver-side listing a read plans with
    if (ident.name() == "snapshots" && ident.namespace().nonEmpty) {
      val tableDir = dirOf(ident.namespace())
      if (fs.exists(tableDir) && fs.getFileStatus(tableDir).isDirectory)
        return new SnapshotsTable(tableDir.toString)
    }
    throw new NoSuchTableException(ident)
  }

  /** SQL `VERSION AS OF <epoch>` — the catalog-level snapshot read. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val d = dirOf(ident)
    if (!fs.exists(d)) throw new NoSuchTableException(ident)
    val epoch =
      try version.trim.toLong
      catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"VERSION AS OF wants a commit epoch (long), got '$version'") }
    new EdgeTable(d.toString, asOf = Some(epoch))
  }

  override def loadTable(ident: Identifier, timestamp: Long): Table =
    throw new UnsupportedOperationException(
      "TIMESTAMP AS OF: commit epochs are logical times with no wall-clock; " +
        "use VERSION AS OF <epoch> (see EdgeTextV2.snapshots for the history)")

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    require(schema.fieldNames.sameElements(EdgeTextV2.schema.fieldNames),
      s"edge tables have the fixed schema (src, dst, w); got " +
        schema.fieldNames.mkString(","))
    // the one supported partition transform: bucket(N, col) — declared
    // here, persisted as _bucketspec, honored by every subsequent write
    // (the storage-partitioned-join layout); range layout stays a
    // write-time `layout` option
    val bucketSpec: Option[(String, Int)] = partitions match {
      case Array() => None
      case Array(t) if t.name == "bucket" =>
        val ns = t.arguments.collect {
          case l: org.apache.spark.sql.connector.expressions.Literal[_]
              if l.value.isInstanceOf[Int] => l.value.asInstanceOf[Int]
        }
        val cols = t.arguments.collect {
          case r: org.apache.spark.sql.connector.expressions.NamedReference =>
            r.fieldNames.mkString(".")
        }
        require(ns.length == 1 && cols.length == 1 && ns.head > 0 &&
            EdgeTextV2.statCol(cols.head),
          s"PARTITIONED BY wants bucket(<n>, src|dst|w), got $t")
        Some((cols.head, ns.head))
      case _ => throw new UnsupportedOperationException(
        "edge tables support exactly one bucket(N, col) partition " +
          "transform (range layout is the write-time `layout` option)")
    }
    val d = dirOf(ident)
    if (fs.exists(d)) throw new TableAlreadyExistsException(ident)
    fs.mkdirs(d)
    bucketSpec.foreach { case (c, n) => EdgeTextV2.writeBucketSpec(fs, d, c, n) }
    new EdgeTable(d.toString)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "edge tables have a fixed schema; nothing to alter")

  override def dropTable(ident: Identifier): Boolean = {
    val d = dirOf(ident)
    fs.exists(d) && fs.delete(d, true)
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val from = dirOf(oldIdent); val to = dirOf(newIdent)
    if (!fs.exists(from)) throw new NoSuchTableException(oldIdent)
    if (fs.exists(to)) throw new TableAlreadyExistsException(newIdent)
    if (!fs.rename(from, to))
      throw new IllegalStateException(s"rename $from -> $to failed")
  }

  // ---- functions (FunctionCatalog): the canonical `bucket` that makes
  // the connector's reported bucket(N, col) transforms RESOLVABLE — the
  // storage-partitioned-join prerequisite (Iceberg's system.bucket).
  // Addressable both at the catalog root and under `system`. ------------

  private def fnNamespace(ns: Array[String]): Boolean =
    ns.isEmpty || ns.sameElements(Array("system"))

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    if (fnNamespace(namespace)) Array(Identifier.of(namespace, "bucket"))
    else if (namespaceExists(namespace)) Array.empty
    else throw new NoSuchNamespaceException(namespace)

  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    if (fnNamespace(ident.namespace()) && ident.name() == "bucket")
      EdgeBucketFunction
    else throw new org.apache.spark.sql.catalyst.analysis
      .NoSuchFunctionException(ident)

  override def functionExists(ident: Identifier): Boolean =
    fnNamespace(ident.namespace()) && ident.name() == "bucket"

  // ---- namespaces (directories under the warehouse) --------------------

  override def listNamespaces(): Array[Array[String]] = {
    fs.mkdirs(warehouse)
    fs.listStatus(warehouse).filter(_.isDirectory)
      .map(s => Array(s.getPath.getName)).sortBy(_.head)
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty
    else throw new NoSuchNamespaceException(namespace)

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || fs.exists(dirOf(namespace))

  override def loadNamespaceMetadata(namespace: Array[String])
      : util.Map[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    util.Collections.singletonMap("location", dirOf(namespace).toString)
  }

  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String]): Unit = {
    fs.mkdirs(dirOf(namespace)); ()
  }

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("namespaces carry no metadata")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val d = dirOf(namespace)
    if (!fs.exists(d)) return false
    if (!cascade && fs.listStatus(d).nonEmpty)
      throw new IllegalStateException(s"namespace ${namespace.mkString(".")} is not empty")
    fs.delete(d, true)
  }
}

/** The `.snapshots` metadata table (Iceberg's `table.snapshots` analog):
  * one row per commit epoch with shard count and byte size. The listing
  * is the same O(shards) driver-side manifest scan a read plans with, and
  * the result is a handful of rows — served as a [[org.apache.spark.sql
  * .connector.read.LocalScan]], no executor tasks at all. */
private[v2] class SnapshotsTable(tableDir: String) extends Table
    with SupportsRead {
  import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
  import org.apache.spark.sql.types.{LongType, StructField}

  private val snapSchema = StructType(Seq(
    StructField("epoch", LongType, nullable = false),
    StructField("n_shards", LongType, nullable = false),
    StructField("bytes", LongType, nullable = false)))

  override def name(): String = s"graft_edges($tableDir).snapshots"
  override def schema(): StructType = snapSchema
  override def capabilities()
      : util.Set[org.apache.spark.sql.connector.catalog.TableCapability] =
    util.EnumSet.of(org.apache.spark.sql.connector.catalog.TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new LocalScan {
        override def readSchema(): StructType = snapSchema
        override def rows(): Array[org.apache.spark.sql.catalyst.InternalRow] = {
          val conf = new Configuration()
          EdgeScan.listShards(tableDir)
            .groupBy(f => EdgeTextV2.epochValue(f))
            .toSeq.sortBy(_._1)
            .map { case (e, files) =>
              val bytes = files.map { f =>
                val p = new Path(f)
                FileSystem.get(p.toUri, conf).getFileStatus(p).getLen
              }.sum
              new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
                Array[Any](e, files.length.toLong, bytes))
                : org.apache.spark.sql.catalyst.InternalRow
            }.toArray
        }
        override def description(): String = s"graft_snapshots($tableDir)"
      }
    }
}
