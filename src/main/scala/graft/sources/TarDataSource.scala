package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** DataSource V2 reader for directories of WebDataset-style `.tar` shards —
  * the engine's "training-shard scan" operator, built on Spark's connector
  * API instead of an RDD so Catalyst owns pruning and filter plumbing.
  *
  * Row shape: (shard string, name string, size long, content binary) — one
  * row per tar member.
  *
  * Scale design (the three levers a 100 TB shard corpus needs):
  *  - ONE InputPartition PER SHARD FILE: tar is a sequential format with no
  *    central index, so the shard is the natural (and only correct) split
  *    unit — exactly how WebDataset shards are sized in practice (100 MB–1 GB
  *    each, thousands of shards = thousands of parallel tasks).
  *  - PLANNING-TIME shard pruning: equality/IN/prefix filters on `shard`
  *    drop whole files before any byte is read (the partition-pruning
  *    analog; `rdd.getNumPartitions` shrinks, spec-asserted).
  *  - Column pruning reaches the PAYLOAD: if `content` is not in the
  *    projection, readers skip member bytes instead of materializing them
  *    (a metadata scan of a petabyte corpus reads headers only). Member
  *    `name` filters short-circuit at read time the same way.
  *
  * Filesystem access goes through the SESSION's Hadoop configuration
  * (captured at scan-build time on the driver, shipped to readers as a
  * [[SerializableConfiguration]]) so `spark.hadoop.*` settings — s3a
  * credentials, defaultFS, nameservices — apply exactly as they do to
  * Spark's own file sources.
  *
  * Filters are ALSO left in the post-scan plan (pushFilters returns its
  * input), the same belt-and-braces contract Spark's own parquet source
  * uses — pruning is an optimization, never the correctness boundary.
  *
  * Reference analog: the reference's source corpus is a directory of
  * record files walked and streamed in bulk (KafkaProducer.kt:37-48);
  * this is that contract in the shard format LLM pipelines actually use.
  */
class TarDataSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  /** Short name for `.format("graft-tar")` and SQL `USING graft-tar`
    * (registered in META-INF/services per the DataSourceRegister
    * contract). */
  override def shortName(): String = "graft-tar"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TarTable.SCHEMA

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new TarTable(properties.asScala.get("path")
      .getOrElse(throw new IllegalArgumentException(
        "graft-tar needs a path: spark.read.format(...).load(dir)")))

  override def supportsExternalMetadata(): Boolean = false
}

object TarTable {
  val SCHEMA: StructType = StructType(Seq(
    StructField("shard", StringType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("size", LongType, nullable = false),
    StructField("content", BinaryType, nullable = true)))

  /** The session's Hadoop conf, serializable for executor-side use. */
  private[sources] def sessionConf(): SerializableConfiguration =
    new SerializableConfiguration(SparkSession.active.sessionState.newHadoopConf())
}

class TarTable(dir: String) extends Table with SupportsRead {
  override def name(): String = s"graft-tar:$dir"
  override def schema(): StructType = TarTable.SCHEMA
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TarScanBuilder(dir, TarTable.sessionConf(),
      options.getInt("maxShardsPerTrigger", -1))
}

class TarScanBuilder(dir: String, conf: SerializableConfiguration,
                     maxShardsPerTrigger: Int = -1)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownLimit {

  private var requiredSchema: StructType = TarTable.SCHEMA
  private var pushed: Array[Filter] = Array.empty
  private var limit: Int = -1

  override def pruneColumns(requiredSchema: StructType): Unit =
    this.requiredSchema = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(TarFilters.supported)
    filters // Spark re-evaluates everything — pruning is never correctness
  }
  override def pushedFilters(): Array[Filter] = pushed

  /** LIMIT pushdown: readers stop walking a shard after `limit` matching
    * members — tar is sequential, so an early stop saves exactly the
    * unread tail's IO. Per-PARTITION cap only, hence partially pushed:
    * Spark keeps its global limit on top. */
  override def pushLimit(limit: Int): Boolean = {
    this.limit = limit
    true
  }
  override def isPartiallyPushed(): Boolean = true

  override def build(): Scan =
    new TarScan(dir, requiredSchema, pushed, conf, limit, maxShardsPerTrigger)
}

/** The serializable member-filter subset: shard-level predicates prune
  * whole files at PLANNING time; name-level predicates skip members at
  * read time (and their payload bytes with them). */
object TarFilters {
  def supported(f: Filter): Boolean = f match {
    case sources.EqualTo("shard" | "name", _: String) => true
    case sources.In("shard", vs) => vs.forall(_.isInstanceOf[String])
    case sources.StringStartsWith("shard" | "name", _) => true
    case sources.StringEndsWith("shard" | "name", _) => true
    case sources.StringContains("shard" | "name", _) => true
    case _ => false
  }

  def accepts(fs: Seq[Filter], attr: String, value: String): Boolean =
    fs.forall {
      case sources.EqualTo(a, v: String) if a == attr => value == v
      case sources.In(a, vs) if a == attr => vs.contains(value)
      case sources.StringStartsWith(a, p) if a == attr => value.startsWith(p)
      case sources.StringEndsWith(a, s) if a == attr => value.endsWith(s)
      case sources.StringContains(a, s) if a == attr => value.contains(s)
      case _ => true // filters on other attributes don't constrain this one
    }
}

case class TarInputPartition(path: String, shard: String) extends InputPartition

/** One listed shard: full path, basename, byte length (the length rides
  * along from listStatus so statistics never re-fetch file metadata). */
case class TarShardFile(path: String, shard: String, len: Long)

class TarScan(dir: String, requiredSchema: StructType, filters: Array[Filter],
              conf: SerializableConfiguration, limit: Int = -1,
              maxShardsPerTrigger: Int = -1)
    extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = requiredSchema
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String):
      streaming.MicroBatchStream =
    new TarMicroBatchStream(dir, requiredSchema, filters, conf,
      maxShardsPerTrigger)
  override def description(): String =
    s"graft-tar $dir, cols=[${requiredSchema.fieldNames.mkString(",")}], " +
      s"pushed=[${filters.mkString(",")}], limit=$limit"

  override def planInputPartitions(): Array[InputPartition] =
    TarScan.listShards(dir, filters, conf.value)
      .map(s => TarInputPartition(s.path, s.shard): InputPartition)

  /** Honest size statistics for the optimizer, measured AFTER shard
    * pruning: the summed length of exactly the files this scan will read
    * (lengths come from the one listStatus call — no per-file re-fetch).
    * That is what lets Catalyst broadcast a small pruned shard selection
    * into a join instead of shuffling the other side. Row count stays
    * empty — tar has no index, and a guessed row count is worse than
    * none. */
  override def estimateStatistics(): Statistics = {
    val total = TarScan.listShards(dir, filters, conf.value).map(_.len).sum
    new Statistics {
      override def sizeInBytes(): util.OptionalLong = util.OptionalLong.of(total)
      override def numRows(): util.OptionalLong = util.OptionalLong.empty()
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new TarReaderFactory(requiredSchema, filters, conf, limit)
}

object TarScan {
  /** Every shard file passing the shard filters, name-sorted for
    * deterministic partition order. In-progress sink files (no `.tar`
    * suffix until the atomic rename) are invisible by construction. */
  def listShards(dir: String, filters: Array[Filter],
                 hadoopConf: Configuration): Array[TarShardFile] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(hadoopConf)
    val shards =
      if (!fs.exists(p)) Array.empty[org.apache.hadoop.fs.FileStatus]
      else fs.listStatus(p).filter(s => s.isFile && s.getPath.getName.endsWith(".tar"))
    shards
      .map(s => TarShardFile(s.getPath.toString, s.getPath.getName, s.getLen))
      .filter(s => TarFilters.accepts(filters.toSeq, "shard", s.shard))
      .sortBy(_.shard)
  }
}

/** Streaming shard ingest: the micro-batch offset is the SET OF SHARD
  * FILES seen so far (the FileStreamSource model, scoped to `.tar`).
  * Each micro-batch plans exactly the newly-arrived shards — one
  * partition per new shard — so a shard is read EXACTLY ONCE across the
  * life of the checkpoint, including restarts. Shards must be immutable
  * once visible; [[TarShards.writeShards]] honors that by writing under
  * an in-progress name and atomically renaming to `.tar`. Appends to an
  * already-consumed shard are NOT re-read, by design.
  *
  * Offsets serialize as a sorted JSON array of shard basenames. That
  * keeps the offset log human-auditable; at 100 TB the shard COUNT
  * (not size) bounds the offset — thousands of entries, trivially small
  * next to the data. */
class TarMicroBatchStream(dir: String, requiredSchema: StructType,
                          filters: Array[Filter],
                          conf: SerializableConfiguration,
                          maxShardsPerTrigger: Int = -1)
    extends streaming.MicroBatchStream
    with streaming.SupportsAdmissionControl {
  import com.fasterxml.jackson.databind.ObjectMapper

  private def offsetOf(names: Iterable[String]) =
    TarShardSetOffset(scala.collection.immutable.SortedSet.from(names))

  override def initialOffset(): streaming.Offset = offsetOf(Nil)

  /** Backpressure (the maxFilesPerTrigger model): with
    * `maxShardsPerTrigger` set, each micro-batch admits at most that
    * many NEW shards, name-ordered — a burst of landed shards drains as
    * a sequence of bounded batches instead of one giant one. */
  override def getDefaultReadLimit: streaming.ReadLimit =
    if (maxShardsPerTrigger > 0) streaming.ReadLimit.maxFiles(maxShardsPerTrigger)
    else streaming.ReadLimit.allAvailable()

  override def latestOffset(start: streaming.Offset,
                            limit: streaming.ReadLimit): streaming.Offset = {
    val seen = start.asInstanceOf[TarShardSetOffset].shards
    val fresh = TarScan.listShards(dir, filters, conf.value).map(_.shard)
      .filterNot(seen.contains)
    val admitted = limit match {
      case m: streaming.ReadMaxFiles => fresh.take(m.maxFiles())
      case _ => fresh
    }
    offsetOf(seen ++ admitted)
  }

  // legacy single-arg form: unbounded (Spark uses the admission-control
  // overload above when SupportsAdmissionControl is implemented)
  override def latestOffset(): streaming.Offset =
    offsetOf(TarScan.listShards(dir, filters, conf.value).map(_.shard).toSeq)

  override def deserializeOffset(json: String): streaming.Offset = {
    val arr = new ObjectMapper().readValue(json, classOf[Array[String]])
    offsetOf(arr.toSeq)
  }

  override def planInputPartitions(start: streaming.Offset,
                                   end: streaming.Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[TarShardSetOffset].shards
    val target = end.asInstanceOf[TarShardSetOffset].shards
    val fresh = target -- seen
    TarScan.listShards(dir, filters, conf.value)
      .filter(s => fresh.contains(s.shard))
      .map(s => TarInputPartition(s.path, s.shard): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new TarReaderFactory(requiredSchema, filters, conf)

  override def commit(end: streaming.Offset): Unit = ()
  override def stop(): Unit = ()
}

case class TarShardSetOffset(shards: scala.collection.immutable.SortedSet[String])
    extends streaming.Offset {
  override def json(): String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    mapper.writeValueAsString(shards.toArray)
  }
}

class TarReaderFactory(requiredSchema: StructType, filters: Array[Filter],
                       conf: SerializableConfiguration, limit: Int = -1)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new TarPartitionReader(partition.asInstanceOf[TarInputPartition],
      requiredSchema, filters, conf, limit)
}

class TarPartitionReader(part: TarInputPartition, requiredSchema: StructType,
                         filters: Array[Filter],
                         conf: SerializableConfiguration, limit: Int = -1)
    extends PartitionReader[InternalRow] {

  private val needContent = requiredSchema.fieldNames.contains("content")
  private val filterSeq = filters.toSeq // hoisted out of the per-member loop
  private val shardUtf8 = UTF8String.fromString(part.shard)
  private val in = {
    val p = new Path(part.path)
    p.getFileSystem(conf.value).open(p)
  }
  private val members = TarIO.read(in, readBytes = needContent)
  private var current: TarIO.TarMember = null
  private var emitted = 0

  override def next(): Boolean = {
    current = null
    if (limit >= 0 && emitted >= limit) return false // stop mid-shard: IO saved
    while (current == null && members.hasNext) {
      val m = members.next()
      if (TarFilters.accepts(filterSeq, "name", m.name)) current = m
    }
    if (current != null) emitted += 1
    current != null
  }

  override def get(): InternalRow = {
    val values = requiredSchema.fieldNames.map {
      case "shard" => shardUtf8
      case "name" => UTF8String.fromString(current.name)
      case "size" => current.size
      case "content" => current.bytes
      case other => throw new IllegalStateException(s"unknown column $other")
    }
    InternalRow.fromSeq(values.toIndexedSeq)
  }

  override def close(): Unit = in.close()
}
