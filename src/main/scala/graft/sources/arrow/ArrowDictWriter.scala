package graft.sources.arrow

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StringType

/** Dictionary-encoded Arrow IPC dataset writer (SURVEY §2.D5 write
  * side; reference: cpp/src/arrow/ipc/dictionary.h).
  *
  * Spark-first shape: the vocabulary of each encoded column is built
  * by an exact `distinct` job (one shuffle, scales to any corpus; the
  * *vocabulary* must be bounded — that is what makes a column worth
  * dictionary-encoding), broadcast to the executors, and every
  * partition writes its own IPC file encoding indices against the
  * shared dictionary. Readers (ours included — ArrowIo.decodedVectors)
  * see a schema-declared dictionary and decode on load.
  */
object ArrowDictWriter {

  /** Write `df` under `dir` (one IPC file per partition) with
    * `dictCols` dictionary-encoded. Returns total rows written.
    */
  def write(df: DataFrame, dir: String, dictCols: Seq[String],
            stream: Boolean = false, batchRows: Int = 4096 * 4): Long = {
    val schema = df.schema
    dictCols.foreach { c =>
      require(schema(c).dataType == StringType,
        s"dictionary encoding supports string columns, got ${schema(c).dataType} for $c")
    }
    val vocabs: Map[String, Array[String]] = dictCols.map { c =>
      c -> df.select(col(c)).where(col(c).isNotNull).distinct().orderBy(col(c))
        .collect().map(_.getString(0))
    }.toMap
    val sc = df.sparkSession.sparkContext
    val hconf = new SerializableHadoopConf(sc.hadoopConfiguration)
    HadoopFiles.mkdirs(dir, hconf.value)
    val bc = sc.broadcast(vocabs)
    val counts = df.queryExecution.toRdd.mapPartitionsWithIndex { (pid, it) =>
      Iterator.single(ArrowIo.writeRowsDict(
        f"$dir/part-$pid%05d.arrow", schema, it, bc.value, stream, batchRows,
        conf = hconf.value))
    }.collect()
    counts.sum
  }
}
