package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.arrow.{HadoopFiles, SerializableHadoopConf}

/** Parquet footer metadata as a DataFrame (reference:
  * python/pyarrow/parquet.py `ParquetFile.metadata` /
  * `ParquetDataset.read` schema+metadata surface, parquet.py:64–117).
  *
  * One row per (file, row group, column chunk), carrying the row
  * counts, value counts, null counts and compressed sizes a user
  * inspects before planning reads. Footers are read DISTRIBUTED — the
  * file list fans out over the cluster and each task opens only its
  * own footers — so profiling a 100 TB dataset's metadata is a
  * seconds-long metadata-only job, never a driver loop and never a
  * data scan.
  */
object ParquetInfo {

  /** One column chunk of one row group. `null_count` is None when the
    * writer omitted statistics (matches parquet_metadata's NULL).
    */
  case class ColumnChunkMeta(
      file: String,
      row_group_id: Long,
      path_in_schema: String,
      row_group_num_rows: Long,
      num_values: Long,
      null_count: Option[Long],
      total_compressed_size: Long)

  /** Footer metadata rows for a parquet file or dataset directory. */
  def rowGroups(spark: SparkSession, path: String): DataFrame = {
    val hconf = new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)
    val files = HadoopFiles.dataFiles(path, hconf.value)
    import spark.implicits._
    // fan out to the cluster's full width (one footer open per file;
    // a fixed small cap would serialize 100k-file datasets)
    val parts = math.max(1,
      math.min(files.size, spark.sparkContext.defaultParallelism * 2))
    spark.createDataset(files).repartition(parts)
      .flatMap { f =>
        val reader = ParquetFileReader.open(
          HadoopInputFile.fromPath(new Path(f), hconf.value))
        try {
          val name = new Path(f).getName
          reader.getFooter.getBlocks.asScala.toSeq.zipWithIndex.flatMap {
            case (block, i) =>
              block.getColumns.asScala.toSeq.map { c =>
                val nulls = Option(c.getStatistics)
                  .filter(_.isNumNullsSet).map(_.getNumNulls)
                ColumnChunkMeta(name, i.toLong, c.getPath.toDotString,
                  block.getRowCount, c.getValueCount, nulls, c.getTotalSize)
              }
          }
        } finally reader.close()
      }
      .toDF()
  }
}
