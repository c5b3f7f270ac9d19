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
    // overwrite semantics + task-commit protocol (same as the DSv2
    // sink): stale part files from a previous wider write are removed,
    // tasks write hidden .tmp files and rename into place — a retried/
    // speculative task never exposes a partial IPC file to readers
    HadoopFiles.mkdirs(dir, hconf.value)
    HadoopFiles.dataFiles(dir, hconf.value)
      .foreach(f => HadoopFiles.delete(f, hconf.value))
    val bc = sc.broadcast(vocabs)
    val counts = df.queryExecution.toRdd.mapPartitionsWithIndex { (pid, it) =>
      val tmp = f"$dir/.part-$pid%05d.arrow.tmp"
      val dst = f"$dir/part-$pid%05d.arrow"
      val n = ArrowIo.writeRowsDict(
        tmp, schema, it, bc.value, stream, batchRows, conf = hconf.value)
      HadoopFiles.rename(tmp, dst, hconf.value)
      Iterator.single(n)
    }.collect()
    counts.sum
  }
}
