package graft.sources.mat

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 reader for the reference's `.mat` layout (S1 —
  * reference `tools.py:58-79`): per-class feature matrices `x` and
  * permutation matrices `r` stored as cell arrays.
  *
  * `spark.read.format("graft-mat").load(path)` yields
  * `(var STRING, cls INT, row_idx INT, vals ARRAY<DOUBLE>)`:
  * one row per matrix row, `cls` = the cell (class) index, `vals` =
  * that row widened to double. Options:
  *  - `vars` — comma-separated variable projection (S2 at the source:
  *    unlisted variables are never even structure-parsed into
  *    partitions)
  *
  * Scale shape: planning scans only element tags (O(#variables) I/O);
  * each (variable, class) cell becomes its own InputPartition whose
  * reader seeks directly to the cell's payload, so classes decode in
  * parallel and a pruned read of the metadata columns (`vals` not
  * required) performs NO data I/O at all — the row set comes from the
  * dimensions in the tags. A .mat file is still a single-file format:
  * for 100 TB pipelines this source is the fidelity/ingest edge, and
  * the first job is `CREATE TABLE ... AS SELECT` into parquet.
  */
final class GraftMatSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-mat"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftMatTable.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-mat: .load(path) is required"))
    val vars = Option(properties.get("vars"))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val maxRows = Option(properties.get("maxRowsPerPartition"))
      .map(_.toInt).getOrElse(1 << 20)
    require(maxRows > 0, "maxRowsPerPartition must be positive")
    new GraftMatTable(path, vars, maxRows)
  }
}

object GraftMatTable {
  val Schema: StructType = StructType(Seq(
    StructField("var", StringType, nullable = false),
    StructField("cls", IntegerType, nullable = false),
    StructField("row_idx", IntegerType, nullable = false),
    StructField("vals", ArrayType(DoubleType, containsNull = false), nullable = false)))
}

final class GraftMatTable(path: String, vars: Option[Set[String]], maxRows: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft-mat:$path"
  override def schema(): StructType = GraftMatTable.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftMatScanBuilder(path, vars, maxRows)
}

final class GraftMatScanBuilder(path: String, vars: Option[Set[String]], maxRows: Int)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters {
  import org.apache.spark.sql.sources.{EqualTo, Filter, In}

  private var required: StructType = GraftMatTable.Schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** `var`/`cls` equality and IN filters prune whole (variable, class)
    * cells at PLANNING time — their payloads are never even assigned
    * to a partition, the .mat analogue of parquet partition pruning.
    * Accepted filters are still re-applied by Spark (we return them as
    * residuals), so correctness never depends on the pruning.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter {
      case EqualTo("var", _: String) => true
      case In("var", vs) => vs.forall(_.isInstanceOf[String])
      case EqualTo("cls", _: Int) => true
      case In("cls", vs) => vs.forall(_.isInstanceOf[Int])
      case _ => false
    }
    filters // all residual: Spark re-evaluates everything
  }

  override def pushedFilters(): Array[Filter] = pushed

  private def keepVar(name: String): Boolean =
    vars.forall(_.contains(name)) && pushed.forall {
      case EqualTo("var", v: String) => name == v
      case In("var", vs) => vs.contains(name)
      case _ => true
    }

  private def keepCls(cls: Int): Boolean = pushed.forall {
    case EqualTo("cls", v: Int) => cls == v
    case In("cls", vs) => vs.contains(cls)
    case _ => true
  }

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def description(): String =
      s"graft-mat $path vars=${vars.map(_.mkString(",")).getOrElse("*")} " +
        s"cols=${required.fieldNames.mkString(",")} pushed=[${pushed.mkString(",")}]"
    override def toBatch: Batch = this

    override def planInputPartitions(): Array[InputPartition] = {
      val metas = MatV5.scanStructure(path).filter(v => keepVar(v.name))
      metas.flatMap { v =>
        v.cells.zipWithIndex.collect { case (m, i) if keepCls(i) =>
          // a huge cell splits into row ranges so it parallelizes like
          // any other table; readers do bounded strided reads of only
          // their own rows (MatV5.readRows)
          (0 until m.rows by maxRows).map { start =>
            MatInputPartition(path, v.name, i, start,
              math.min(maxRows, m.rows - start), m.rows, m.cols, m.dataType, m.dataOffset)
          } match {
            case Seq() => Seq(MatInputPartition(path, v.name, i, 0, 0, m.rows, m.cols, m.dataType, m.dataOffset))
            case parts => parts
          }
        }.flatten
      }.toArray
    }

    override def createReaderFactory(): PartitionReaderFactory =
      new MatReaderFactory(required)
  }
}

final case class MatInputPartition(path: String, varName: String, cls: Int,
                                   rowStart: Int, rowCount: Int, totalRows: Int,
                                   cols: Int, dataType: Int,
                                   dataOffset: Long) extends InputPartition

final class MatReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[MatInputPartition]
    new PartitionReader[InternalRow] {
      // the only data I/O in the reader — lazy, so it is skipped
      // entirely when `vals` is pruned away (dims came from the
      // planning-time tag scan)
      private lazy val data: Array[Double] =
        MatV5.readRows(p.path,
          MatV5.NumericMeta(p.totalRows, p.cols, p.dataType, p.dataOffset),
          p.rowStart, p.rowCount)
      private var r = -1

      override def next(): Boolean = { r += 1; r < p.rowCount }

      override def get(): InternalRow = {
        val values = required.fieldNames.map {
          case "var" => UTF8String.fromString(p.varName)
          case "cls" => p.cls
          case "row_idx" => p.rowStart + r
          case "vals" =>
            // column-major slice -> this row's vector
            val row = new Array[Double](p.cols)
            var j = 0
            while (j < p.cols) { row(j) = data(j * p.rowCount + r); j += 1 }
            new GenericArrayData(row)
          case other => throw new IllegalStateException(s"unknown column $other")
        }
        InternalRow.fromSeq(values.toIndexedSeq)
      }

      override def close(): Unit = ()
    }
  }
}
