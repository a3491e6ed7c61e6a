package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsReportStatistics}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector form of the HTML-extraction boundary (SURVEY
  * §2.1 S1's idiomatic connector shape): `format(classOf[HtmlBlocksSource]
  * .getName).option("blockClass", …).load(path)` yields one
  * (pos, block) row per page fragment — the same (page → per-listing
  * fragment) split `HtmlScrapers` performed with wholetext+split, as a
  * proper Table with its own Batch/InputPartition/PartitionReader stack.
  *
  * Options: `blockClass` splits on the literal `class="<value>"` marker
  * (the listing-page shape); `delimiter` splits on any literal string
  * (`<tr>` for the wiki table). `pos` is the fragment index within its
  * page — the within-page order the sentinel segmentation needs.
  *
  * Scale shape: a path may be a single page file or a directory of them
  * (a crawl dump); each file is one InputPartition, so a 100 TB dump
  * parallelizes per page file with no driver-side content reads. The
  * leading pre-marker fragment of each page is emitted like any other
  * block (parity with String.split) — downstream field extraction drops
  * it with its has-a-href / has-a-cell filter.
  */
class HtmlBlocksSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    HtmlBlocksSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    // properties arrive as the case-SENSITIVE option map — normalize
    val opts = new CaseInsensitiveStringMap(properties)
    val delimiter = (Option(opts.get("delimiter")), Option(opts.get("blockClass"))) match {
      case (Some(d), None) => d
      case (None, Some(c)) => s"""class="$c""""
      case _ => throw new IllegalArgumentException(
        "html source requires exactly one of blockClass / delimiter")
    }
    new HtmlBlocksTable(
      Option(opts.get("path")).getOrElse(
        throw new IllegalArgumentException("html source requires a path")),
      delimiter)
  }
}

object HtmlBlocksSource {
  val Schema: StructType = StructType(Seq(
    StructField("pos", LongType, nullable = false),
    StructField("block", StringType)))
}

private[sources] class HtmlBlocksTable(path: String, delimiter: String)
    extends Table with SupportsRead {
  override def name(): String = s"html_blocks($path)"
  override def schema(): StructType = HtmlBlocksSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch with SupportsReportStatistics {
      override def build(): Scan = this
      override def readSchema(): StructType = HtmlBlocksSource.Schema
      override def toBatch: Batch = this

      // REAL statistics from file metadata (names + sizes only — no
      // content read): without this, Catalyst assumes the worst-case
      // default for an unknown DSv2 source and every size-gated guard
      // (CrossJoinGuard, GlobalWindowGuard) sees "huge" for a few-KB
      // page dump. Blocks expand modestly over raw HTML; 2× covers the
      // UTF-8→UTF8String and per-row overhead.
      override def estimateStatistics(): Statistics = {
        val p = java.nio.file.Paths.get(path)
        val bytes =
          try {
            if (java.nio.file.Files.isDirectory(p)) {
              val s = java.nio.file.Files.list(p)
              try s.iterator().asScala.map(java.nio.file.Files.size).sum
              finally s.close()
            } else java.nio.file.Files.size(p)
          } catch { case _: java.io.IOException => 0L }
        new Statistics {
          override def sizeInBytes(): java.util.OptionalLong =
            java.util.OptionalLong.of(math.max(bytes * 2, 1L))
          override def numRows(): java.util.OptionalLong =
            java.util.OptionalLong.empty()
        }
      }

      override def planInputPartitions(): Array[InputPartition] = {
        // one partition per page file — the unit of parallelism for a
        // crawl dump; only file NAMES are listed on the driver
        val p = java.nio.file.Paths.get(path)
        val files =
          if (java.nio.file.Files.isDirectory(p)) {
            val s = java.nio.file.Files.list(p)
            try s.iterator().asScala.filter(java.nio.file.Files.isRegularFile(_))
              .map(_.toString).toArray.sorted
            finally s.close()
          } else Array(path)
        files.map(f => HtmlFilePartition(f, delimiter): InputPartition)
      }

      override def createReaderFactory(): PartitionReaderFactory =
        new HtmlBlocksReaderFactory
    }
}

private[sources] case class HtmlFilePartition(file: String, delimiter: String)
    extends InputPartition

private[sources] class HtmlBlocksReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[HtmlFilePartition]
    new PartitionReader[InternalRow] {
      // String.split with the same literal marker as the column form —
      // block boundaries must be byte-identical between the two paths
      private val blocks: Iterator[String] = {
        val content = new String(
          java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p.file)),
          java.nio.charset.StandardCharsets.UTF_8)
        content.split(java.util.regex.Pattern.quote(p.delimiter), -1).iterator
      }
      private var pos: Long = -1L
      private var current: String = _
      override def next(): Boolean = {
        if (blocks.hasNext) { current = blocks.next(); pos += 1; true }
        else false
      }
      override def get(): InternalRow =
        InternalRow(pos, UTF8String.fromString(current))
      override def close(): Unit = ()
    }
  }
}
