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

  /** Dictionary-worthiness guard: the vocabulary is collected to the
    * driver and broadcast, so an unbounded-cardinality column would be
    * a driver OOM. The cap turns that into an immediate, actionable
    * error instead.
    */
  val DefaultMaxVocab: Int = 1 << 20

  /** Write `df` under `dir` (one IPC file per partition) with
    * `dictCols` dictionary-encoded. Returns total rows written.
    *
    * @param maxVocab upper bound on per-column dictionary size; a
    *   column exceeding it fails fast with a clear error (raise it
    *   only if the driver has heap for the vocabulary broadcast).
    */
  def write(df: DataFrame, dir: String, dictCols: Seq[String],
            stream: Boolean = false, batchRows: Int = 4096 * 4,
            maxVocab: Int = DefaultMaxVocab): Long = {
    val schema = df.schema
    dictCols.foreach { c =>
      require(schema(c).dataType == StringType,
        s"dictionary encoding supports string columns, got ${schema(c).dataType} for $c")
    }
    val vocabs: Map[String, Array[String]] = dictCols.map { c =>
      // limit(maxVocab+1) bounds the collect itself: the driver never
      // holds more than cap+1 values even when the column cardinality
      // is in the billions.
      val vocab = df.select(col(c)).where(col(c).isNotNull).distinct()
        .limit(maxVocab + 1).collect().map(_.getString(0))
      require(vocab.length <= maxVocab,
        s"column '$c' has more than $maxVocab distinct values — it is not " +
          "dictionary-worthy; write it as a plain column or raise maxVocab")
      c -> vocab.sorted
    }.toMap
    val sc = df.sparkSession.sparkContext
    val hconf = new SerializableHadoopConf(sc.hadoopConfiguration)
    // staged overwrite: tasks write only invisible attempt-unique tmp
    // files, the driver commits after job success
    // (HadoopFiles.commitStagedWrite) — a failed or partial job never
    // disturbs the previous dataset
    HadoopFiles.mkdirs(dir, hconf.value)
    val stale = HadoopFiles.dataFiles(dir, hconf.value).toSet
    val token = java.util.UUID.randomUUID().toString.take(12)
    val bc = sc.broadcast(vocabs)
    val counts = df.queryExecution.toRdd.mapPartitionsWithIndex { (pid, it) =>
      val tid = org.apache.spark.TaskContext.get().taskAttemptId()
      val tmp = s"$dir/${HadoopFiles.stagedName(token, pid, tid, "arrow")}"
      val n = HadoopFiles.stageTask(tmp, hconf.value)(p => ArrowIo.writeRowsDict(
        p, schema, it, bc.value, stream, batchRows, conf = hconf.value))
      Iterator.single(n)
    }.collect()
    HadoopFiles.commitStagedWrite(dir, token, stale,
      pid => f"part-$pid%05d.arrow", hconf.value)
    counts.sum
  }
}
