package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.Tables
import graft.operators.Bm25Index

/** Heap attribution for the Bm25Index BUILD leg (VERDICT r12 item 4:
  * the 15M-doc build needed a 48 GB driver heap — is any build-path
  * structure driver-resident, or is the pressure task execution
  * memory conflated into the one local[32] JVM?).
  *
  * Instruments one `Bm25Index.write` with:
  *  - sum over tasks of `peakExecutionMemory` and the shuffle/spill
  *    counters per completed stage (task-side memory, by definition —
  *    a driver-resident structure appears in NONE of these);
  *  - a driver-heap sampler thread (max used heap over the run);
  *  - the knobs under test as CLI args: shuffle partitions and
  *    `filesPerBucket` (write concurrency × parquet row-group
  *    buffers).
  *
  * If raising shuffle partitions at a FIXED small heap turns a
  * GC-thrashing build into a completing one, the demand scales with
  * per-task working set (execution memory / writer buffers), not with
  * any driver-held state — the cluster-distributes answer. Run with
  * SPARK_DRIVER_MEM to set the heap.
  *
  * Usage: Bm25BuildProbe <sfDir> [shufflePartitions] [filesPerBucket]
  *        [nBuckets]   (env SPARK_GRAFT_CPUS, SPARK_DRIVER_MEM)
  */
object Bm25BuildProbe {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: Bm25BuildProbe <sfDir> [shufflePartitions] [filesPerBucket] [nBuckets]")
    val sfDir = args(0)
    val shufP = if (args.length > 1) args(1).toInt else 32
    val fpb = if (args.length > 2) args(2).toInt else 4
    val nBuckets = if (args.length > 3) args(3).toInt else 64
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufP)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val peakExec = new AtomicLong // sum over tasks of per-task peaks
    val memSpill = new AtomicLong
    val diskSpill = new AtomicLong
    val shufWrite = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val m = e.stageInfo.taskMetrics
        if (m != null) {
          peakExec.addAndGet(m.peakExecutionMemory)
          memSpill.addAndGet(m.memoryBytesSpilled)
          diskSpill.addAndGet(m.diskBytesSpilled)
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    })
    // driver-heap sampler: max used heap over the run. In local mode
    // this heap HOLDS the executors too — the attribution question is
    // whether the demand tracks the task-side counters above.
    val heapMax = new AtomicLong
    val rt = Runtime.getRuntime
    val sampler = new Thread(() => {
      while (!Thread.currentThread().isInterrupted) {
        heapMax.accumulateAndGet(rt.totalMemory - rt.freeMemory, Math.max _)
        try Thread.sleep(250) catch { case _: InterruptedException => return }
      }
    })
    sampler.setDaemon(true)
    sampler.start()

    val docs = Tables.documents(spark, sfDir)
    val nDocs = docs.count()
    val dir = java.nio.file.Files
      .createTempDirectory("graft-bm25-buildprobe").toString
    val t0 = System.nanoTime()
    Bm25Index.write(docs, "doc_id", "text", dir, nBuckets = nBuckets,
      filesPerBucket = fpb)
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(2000) // drain the listener bus
    sampler.interrupt()

    val gb = 1024.0 * 1024 * 1024
    val ts = java.time.Instant.now().toString
    println(f"""{"metric":"bm25_build_probe","sf_dir":"$sfDir","n_docs":$nDocs,"build_wall":$wall%.3f,"shuffle_partitions":$shufP,"files_per_bucket":$fpb,"n_buckets":$nBuckets,"cpus":"$cpus","driver_mem":"${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}","heap_max_gb":${heapMax.get / gb}%.2f,"peak_exec_sum_gb":${peakExec.get / gb}%.2f,"mem_spill_gb":${memSpill.get / gb}%.2f,"disk_spill_gb":${diskSpill.get / gb}%.2f,"shuffle_write_gb":${shufWrite.get / gb}%.2f,"utc":"$ts"}""")
    spark.stop()
  }
}
